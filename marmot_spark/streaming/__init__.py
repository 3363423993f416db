from marmot_spark.streaming.stream import streaming_session_counts, streaming_source

__all__ = ["streaming_source", "streaming_session_counts"]
