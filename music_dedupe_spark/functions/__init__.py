from music_dedupe_spark.functions import similarity, text  # noqa: F401
