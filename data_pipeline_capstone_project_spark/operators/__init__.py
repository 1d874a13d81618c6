from .upsert import latest_wins  # noqa: F401
from .topk import top_k_per_group, recent_n_per_user  # noqa: F401
from .asof import asof_enrich  # noqa: F401
from .quality import require_rows, require_no_nulls  # noqa: F401
