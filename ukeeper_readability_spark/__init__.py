"""PySpark-native main-content extraction engine.

A from-scratch re-expression of ukeeper/ukeeper-readability's extraction semantics
(Arc90-style candidate scoring, per-domain CSS-selector rules, sanitize/text
pipeline) as vectorized Arrow UDFs over Spark DataFrames of multi-turn agent
transcripts. See SURVEY.md for the full blueprint and reference citations.
"""

__version__ = "0.1.0"
