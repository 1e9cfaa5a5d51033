from fhir2sql_spark.sync.diff import diff_snapshots  # noqa: F401
