"""Scalar path / id / MIME / status functions — pure Column expressions
(JVM-side, whole-stage-codegen friendly; no UDFs).

Reference parity (SURVEY.md §2.6):
  F1 removeLeadingSlash      Utility.java:74-80
  F2 returnLastPathElement   Utility.java:85-92
  F3 getMimeType             Utility.java:99-106
  F4 createTextResultId/createJsonResultId  Utility.java:108-118
  F6 getDocumentIdFromResultId  Utility.java:126-130 (reference impl is broken
     — split(".") is regex so it splits on every char; we implement the intent)
  F7 getDescriptionFromHttpStatus  Utility.java:12-71,132-134 (the full
     static status->description table; unknown code -> null, matching
     Map.get)
  status coercion            DocumentExtractStatus.java:12-18 (unknown -> New)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from cies_ocr_java_spark.schema import STATUS_NEW, VALID_STATUSES

# Extension -> MIME map, matching Utility.java:99-106's behavior of guessing
# from the filename extension with application/octet-stream as the default.
MIME_BY_EXT = {
    "pdf": "application/pdf",
    "txt": "text/plain",
    "html": "text/html",
    "htm": "text/html",
    "json": "application/json",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "tif": "image/tiff",
    "tiff": "image/tiff",
}
DEFAULT_MIME = "application/octet-stream"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def remove_leading_slash(c: Column | str) -> Column:
    """F1: strip a single leading '/' (Utility.java:74-80)."""
    return F.regexp_replace(_col(c), r"^/", "")


def last_path_element(c: Column | str) -> Column:
    """F2: last '/'-separated segment (Utility.java:85-92)."""
    return F.element_at(F.split(_col(c), "/"), -1)


def guess_mime_type(filename: Column | str) -> Column:
    """F3: extension -> MIME with application/octet-stream default."""
    ext = F.lower(F.regexp_extract(_col(filename), r"\.([A-Za-z0-9]+)$", 1))
    expr: Column = F.lit(DEFAULT_MIME)
    for k, v in reversed(list(MIME_BY_EXT.items())):
        expr = F.when(ext == k, F.lit(v)).otherwise(expr)
    return expr


def _suffixed(c: Column | str, suffix: str) -> Column:
    col = _col(c)
    return F.when(col.endswith(suffix), col).otherwise(F.concat(col, F.lit(suffix)))


def text_result_id(c: Column | str) -> Column:
    """F4: append '.txt' iff not already suffixed (Utility.java:108-112)."""
    return _suffixed(c, ".txt")


def json_result_id(c: Column | str) -> Column:
    """F4: append '.json' iff not already suffixed (Utility.java:114-118)."""
    return _suffixed(c, ".json")


def doc_id_from_result_id(c: Column | str) -> Column:
    """F6 (intended semantics): strip a trailing '.txt'/'.json'."""
    return F.regexp_replace(_col(c), r"\.(txt|json)$", "")


# F7: the reference's HTTP status description table, verbatim
# (Utility.java:14-70 — including its idiosyncrasies: 'Ok' not 'OK',
# 'Moved temporarily' for 302, the 419/420 WebDAV-era codes).
STATUS_DESCRIPTIONS = {
    100: "Continue", 102: "Processing", 101: "Switching protocols",
    200: "Ok", 201: "Created", 202: "Accepted", 204: "No content",
    205: "Reset content", 206: "Partial content", 207: "Multi status",
    300: "Multiple choices", 301: "Moved permanently",
    302: "Moved temporarily", 303: "See other", 304: "Not modified",
    305: "Use proxy", 307: "Temporary redirect",
    400: "Bad request", 401: "Unauthorized", 402: "Payment required",
    403: "Forbidden", 404: "Not found", 405: "Method not allowed",
    406: "Not acceptable", 407: "Proxy authentication required",
    408: "Request timeout", 409: "Conflict", 410: "Gone",
    411: "Length required", 412: "Precondition failed",
    413: "Request too long", 414: "Request URI too long",
    415: "Unsupported media type", 416: "Request range not satisfiable",
    417: "Expectation failed", 419: "Insufficient space on resource",
    420: "Method failure", 422: "Unprocessable entity", 423: "Locked",
    424: "Failed dependency", 429: "Too many requests",
    500: "Internal server error", 501: "Not implemented",
    502: "Bad gateway", 503: "Service unavailable", 504: "Gateway timeout",
    505: "HTTP version not supported", 507: "Insufficient storage",
}


def http_status_description(code: Column | str) -> Column:
    """F7: status code -> description; unknown -> null (Map.get semantics,
    Utility.java:132-134). A map literal + try_element_at — constant-folded
    JVM-side, no join, no UDF."""
    pairs = [
        x for k, v in STATUS_DESCRIPTIONS.items() for x in (F.lit(k), F.lit(v))
    ]
    return F.try_element_at(F.create_map(*pairs), _col(code).cast("int"))


def coerce_status(c: Column | str) -> Column:
    """Unknown/null status strings coerce to 'New'
    (DocumentExtractStatus.java:12-18)."""
    col = _col(c)
    return F.when(col.isin(*VALID_STATUSES), col).otherwise(F.lit(STATUS_NEW))
