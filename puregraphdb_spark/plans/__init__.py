from puregraphdb_spark.plans.explain import (  # noqa: F401
    broadcast_join_count, count_exchanges, has_pushed_filter, physical_plan,
)
