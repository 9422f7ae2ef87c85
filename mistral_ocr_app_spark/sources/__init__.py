from .io import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    write_json_sink,
    write_markdown_sink,
    write_turns,
)
