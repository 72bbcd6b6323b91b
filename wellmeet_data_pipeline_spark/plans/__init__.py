from wellmeet_data_pipeline_spark.plans.queries import REGISTRY, QuerySpec  # noqa: F401
