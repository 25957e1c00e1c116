from puregraphdb_spark.streaming import windows  # noqa: F401
