from blackedge_ocr_spark.operators.routing import (  # noqa: F401
    explicit_workflow_col,
    route_workflow,
)
from blackedge_ocr_spark.operators.ocr import (  # noqa: F401
    fill_media_text,
    filter_media,
    first_per_offset,
    ocr_media_map,
)
