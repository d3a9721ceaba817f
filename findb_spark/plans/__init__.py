"""Plan-shaping utilities: explicit physical-strategy helpers (skew
salting, broadcast control) for the cases AQE cannot fix automatically."""

from findb_spark.plans.broadcast import never_broadcast  # noqa: F401
from findb_spark.plans.skew import salted_join  # noqa: F401
