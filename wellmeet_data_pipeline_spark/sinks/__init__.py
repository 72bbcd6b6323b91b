from wellmeet_data_pipeline_spark.sinks.merge import merge_append, read_current  # noqa: F401
from wellmeet_data_pipeline_spark.sinks.http import post_partitioned  # noqa: F401
