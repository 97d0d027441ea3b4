from blackedge_ocr_spark.operators.routing import (  # noqa: F401
    explicit_workflow_col,
    route_workflow,
)
from blackedge_ocr_spark.operators.ocr import ocr_classify_spans  # noqa: F401
