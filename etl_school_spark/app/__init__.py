from etl_school_spark.app.dashboard import Dashboard  # noqa: F401
