from .scalar import (  # noqa: F401
    hex_color,
    media_source_url,
    extract_extension,
    store_key,
    coalesce_sentinel,
    url_decode,
)
from .aggregates import ordered_series, ordered_series_array  # noqa: F401
