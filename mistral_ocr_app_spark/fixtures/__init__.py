from .transcripts import generate_transcripts, write_fixture  # noqa: F401
