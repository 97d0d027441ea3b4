from blackedge_ocr_spark.operators.routing import (  # noqa: F401
    explicit_workflow_col,
    route_workflow,
)
from blackedge_ocr_spark.operators.ocr import fill_media_text, ocr_media_map  # noqa: F401
