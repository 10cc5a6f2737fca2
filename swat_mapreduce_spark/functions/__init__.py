from swat_mapreduce_spark.functions import arrays, hashing, text  # noqa: F401
