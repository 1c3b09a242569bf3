"""Email THREAD ASSEMBLY — the JWZ threading problem, relationally.

A mail corpus arrives as flat messages whose only structure is the
RFC 5322 ``Message-ID`` / ``In-Reply-To`` headers; reconstructing the
conversation trees (roots, depths, child counts, and the classic JWZ
corner — replies whose parent NEVER ARRIVED) is the extraction step
between a mail crawl and any conversation-level dedup/quality pass.
mime.py parses bodies; this module threads the headers.

Shape: messages render from a closed spec as real header text (one
JVM string column per message), the resolver REGEX-PARSES the headers
back out, validates each In-Reply-To against the per-thread id set
(left join — a dangling reference makes an ORPHAN, which becomes its
own root, exactly JWZ's empty-container promotion), then chases parent
pointers with BOUNDED UNROLLED doc-keyed self-joins (the
pagination.py precedent: max_hops joins, pointer-doubling reserved
for unbounded chains). Every join is keyed by (doc_id, idx) — no
cross-thread traffic, fan-out O(messages).

The oracle restates depth/children/root in closed form from the spec
topology (chain vs binary tree by doc parity) — the resolver never
sees that arithmetic, only the header text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["message_headers_col", "assemble_threads", "MAX_DEPTH"]

MAX_DEPTH = 6  # spec bound: n <= 7 messages -> chain depth <= 6


def message_headers_col(doc: Column, idx: Column, n: Column) -> Column:
    """RFC 5322 header block for message ``idx`` of thread ``doc``:
    Message-ID always; In-Reply-To for non-roots — chain topology
    (parent = m-1) on odd doc ids, binary tree (parent = (m-1)//2) on
    even; doc%9==0 rewrites the LAST message's parent to a ghost id
    that never arrives (the JWZ orphan tier)."""
    parent = F.when(doc % 2 == 1, idx - 1).otherwise(
        F.floor((idx - 1) / 2)
    )
    ghost = (doc % 9 == 0) & (idx == n - 1)
    ref = F.when(
        ghost, F.concat(F.lit("<ghost_"), doc.cast("string"), F.lit("@x>"))
    ).otherwise(
        F.concat(F.lit("<m"), doc.cast("string"), F.lit("_"),
                 parent.cast("string"), F.lit("@x>"))
    )
    mid = F.concat(F.lit("<m"), doc.cast("string"), F.lit("_"),
                   idx.cast("string"), F.lit("@x>"))
    subject = F.when(
        idx == 0, F.concat(F.lit("Subject: T"), doc.cast("string"))
    ).otherwise(F.concat(F.lit("Subject: Re: T"), doc.cast("string")))
    return F.concat(
        F.lit("Message-ID: "), mid, F.lit("\r\n"),
        subject, F.lit("\r\n"),
        F.when(idx > 0,
               F.concat(F.lit("In-Reply-To: "), ref, F.lit("\r\n")))
        .otherwise(F.lit("")),
    )


def assemble_threads(msgs: DataFrame, doc_id: str = "doc_id",
                     headers: str = "headers") -> DataFrame:
    """(doc_id, msg_idx, headers) -> per-message thread facts.

    Parses Message-ID / In-Reply-To out of the header text, resolves
    references against the thread's id set, promotes orphans to roots,
    and derives depth + root by MAX_DEPTH unrolled parent joins."""
    parsed = msgs.select(
        doc_id,
        "msg_idx",
        F.regexp_extract(headers, r"Message-ID: <([^>]+)>", 1).alias("mid"),
        F.nullif(
            F.regexp_extract(headers, r"In-Reply-To: <([^>]+)>", 1),
            F.lit(""),
        ).alias("ref"),
    )
    ids = parsed.select(
        F.col(doc_id).alias("t_doc"),
        F.col("mid").alias("t_mid"),
        F.col("msg_idx").alias("t_idx"),
    )
    base = (
        parsed.join(
            ids,
            (F.col(doc_id) == F.col("t_doc")) & (F.col("ref") == F.col("t_mid")),
            "left",
        )
        .select(
            F.col(doc_id).alias("doc_id"),
            "msg_idx",
            "mid",
            "ref",
            F.col("t_idx").alias("parent_idx"),
        )
        .withColumn(
            "orphan",
            (F.col("ref").isNotNull() & F.col("parent_idx").isNull())
            .cast("int"),
        )
    )
    # pointer chase: anc walks up one verified parent per hop
    cur = base.select(
        "doc_id", "msg_idx", "mid", "orphan",
        F.col("msg_idx").alias("anc"),
        F.col("parent_idx").alias("nxt"),
        F.lit(0).alias("depth"),
    )
    hop_src = base.select(
        F.col("doc_id").alias("h_doc"),
        F.col("msg_idx").alias("h_idx"),
        F.col("parent_idx").alias("h_parent"),
    )
    for _ in range(MAX_DEPTH):
        cur = (
            cur.join(
                hop_src,
                (F.col("doc_id") == F.col("h_doc"))
                & (F.col("nxt") == F.col("h_idx")),
                "left",
            )
            .select(
                "doc_id", "msg_idx", "mid", "orphan",
                F.when(F.col("nxt").isNotNull(), F.col("nxt"))
                .otherwise(F.col("anc")).alias("anc"),
                F.when(F.col("nxt").isNotNull(), F.col("h_parent"))
                .otherwise(F.lit(None)).alias("nxt"),
                F.when(F.col("nxt").isNotNull(), F.col("depth") + 1)
                .otherwise(F.col("depth")).alias("depth"),
            )
        )
    children = (
        base.where(F.col("parent_idx").isNotNull())
        .groupBy(
            F.col("doc_id").alias("c_doc"),
            F.col("parent_idx").alias("c_parent"),
        )
        .agg(F.count("*").cast("int").alias("n_children"))
    )
    return (
        cur.join(
            children,
            (F.col("doc_id") == F.col("c_doc"))
            & (F.col("msg_idx") == F.col("c_parent")),
            "left",
        )
        .select(
            "doc_id",
            "msg_idx",
            F.col("mid").alias("msg_id"),
            F.col("anc").cast("int").alias("root_idx"),
            F.col("depth").cast("int").alias("depth"),
            F.coalesce("n_children", F.lit(0)).alias("n_children"),
            "orphan",
        )
    )
