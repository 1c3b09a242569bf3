from cies_ocr_java_spark.functions.text import (  # noqa: F401
    normalize_ws,
    token_count,
    quality_score_cols,
    fingerprint,
)
from cies_ocr_java_spark.functions.paths import (  # noqa: F401
    remove_leading_slash,
    last_path_element,
    guess_mime_type,
    text_result_id,
    json_result_id,
    doc_id_from_result_id,
    coerce_status,
)
