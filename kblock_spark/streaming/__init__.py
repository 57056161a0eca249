from .ingest import (  # noqa: F401
    read_pages_stream,
    stream_tile_rollup,
    run_stream_to_parquet,
)
