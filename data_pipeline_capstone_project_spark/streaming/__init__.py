from .upsert_stream import streaming_upsert_run, streaming_upsert_query  # noqa: F401
