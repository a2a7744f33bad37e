from mlentory_etl_pipeline_spark.streaming.incremental import (
    incremental_rows,
    tumbling_window_agg,
    watermark_agg,
    watermark_of,
)

__all__ = ["incremental_rows", "tumbling_window_agg", "watermark_agg", "watermark_of"]
