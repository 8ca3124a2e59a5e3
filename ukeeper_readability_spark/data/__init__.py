from .synth import (
    BOILERPLATE_WRAP_SQL,
    CLEAN_TEXT_GUARD,
    PLAIN_WRAP_SQL,
    RULES_FROM_NATION_SQL,
    excerpt_sql,
    fixture_transcript_rows,
    fixture_transcripts_df,
    load_fixture,
    transcripts_from_documents_sql,
)

__all__ = [
    "BOILERPLATE_WRAP_SQL",
    "CLEAN_TEXT_GUARD",
    "PLAIN_WRAP_SQL",
    "RULES_FROM_NATION_SQL",
    "excerpt_sql",
    "fixture_transcript_rows",
    "fixture_transcripts_df",
    "load_fixture",
    "transcripts_from_documents_sql",
]
