"""Image extraction — deterministic re-specification of extractPics.

The reference (extractor/pics.go:14-56) fetches every <img src> over the network
and picks the largest by response byte count — unavailable and nondeterministic in
a table-scan engine (its own test only asserts set membership, pics_test.go:39).
Deterministic substitute, documented in FIXTURES.md §3: `images` is the
lexicographically sorted src list (matches pics.go:42 exactly);
`lead_image_url` is the first image in document order.
"""

from __future__ import annotations

from ..htmldom import find_all
from ..htmldom.node import Node


def extract_pics(article_root: Node):
    """Returns (main_image, all_images, ok) from the rich-article DOM."""
    srcs = []
    for img in find_all(article_root, "img"):
        src = img.get_attr("src")
        if src is not None:
            srcs.append(src)
    if not srcs:
        return "", None, False
    all_images = sorted(srcs)
    main_image = srcs[0]  # deterministic: first in document order
    return main_image, all_images, True
