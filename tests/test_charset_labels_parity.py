"""Whole-label-table parity: engine/charset.py's WHATWG label map must equal
the reference's vendored htmlindex, label for label.

Parses vendor/golang.org/x/text/encoding/htmlindex/tables.go (the enum, the
canonical-name array, and nameMap) and checks every one of its 228 labels
resolves through charset.lookup() to the same canonical encoding — and that
we define no EXTRA labels the reference would treat as unknown."""

import os
import re

import pytest

from ukeeper_readability_spark.engine.charset import _LABELS, lookup

TABLES = "/root/reference/vendor/golang.org/x/text/encoding/htmlindex/tables.go"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TABLES), reason="reference vendor tree not present"
)


def _vendored_label_map():
    src = open(TABLES, encoding="utf-8").read()
    enum = re.search(
        r"const \(\s*utf8 htmlEncoding = iota(.*?)\)", src, re.S
    ).group(1)
    names = ["utf8"] + [
        ln.strip() for ln in enum.splitlines()
        if ln.strip() and ln.strip() != "numEncodings"
    ]
    canon_body = re.search(
        r"var canonical = \[numEncodings\]string\{(.*?)\}", src, re.S
    ).group(1)
    canonical = re.findall(r'"([^"]*)"', canon_body)
    assert len(canonical) == len(names)
    ident_to_canon = dict(zip(names, canonical))
    label_map = {}
    body = re.search(r"var nameMap = map\[string\]htmlEncoding\{(.*?)\n\}", src, re.S).group(1)
    for label, ident in re.findall(r'"([^"]+)":\s*(\w+),', body):
        label_map[label] = ident_to_canon[ident]
    return label_map


def test_every_vendored_label_resolves_identically():
    ref = _vendored_label_map()
    assert len(ref) == 228  # htmlindex label count (round-1 SURVEY claim)
    for label, canon in ref.items():
        spec, got = lookup(label)
        assert spec is not None, f"label {label!r} unknown to charset.lookup"
        assert got == canon, (label, got, canon)


def test_no_extra_labels():
    ref = _vendored_label_map()
    extra = set(_LABELS) - set(ref)
    assert not extra, f"labels the reference would reject: {sorted(extra)}"


def test_unknown_labels_rejected():
    for label in ("utf-9", "latin-42", "", "x-mac-greek?", "gb2312-80x"):
        spec, name = lookup(label)
        assert spec is None and name == ""
