from wellmeet_data_pipeline_spark.functions import text, vectors  # noqa: F401
