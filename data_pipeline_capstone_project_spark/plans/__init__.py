from .history import history_fact, HISTORY_ORACLE_SQL  # noqa: F401
from .engagement import rolling_engagement, ROLLING_ENGAGEMENT_ORACLE_SQL  # noqa: F401
