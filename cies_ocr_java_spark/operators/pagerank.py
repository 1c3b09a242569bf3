"""Domain-authority PageRank over the cross-domain syndication graph.

A web-scale training corpus wants a per-domain quality prior; with no
hyperlinks in the extracted text, the strongest publicly observable
inter-domain signal the corpus itself carries is SYNDICATION — the same
content appearing on several domains. Near-duplicate pairs that cross
domains therefore define an (undirected, symmetrized) domain graph, and
PageRank over it scores how centrally a domain sits in the reuse network
(a FineWeb/C4-style heuristic: heavily-syndicated hub domains get rank
mass from every domain that shares their content).

Scale shape (domains ~ 10^7 at web scale, i.e. tiny next to documents):
  * edge derivation rides the existing LSH near-dup path (candidates via
    banding, exact verification — nothing all-pairs), then two
    broadcast-friendly joins docs->source;
  * the static edge table (with out-degrees pre-joined) is persisted
    ONCE; each PageRank round is one groupBy(dst) shuffle over edges;
  * the rank iterate's lineage is truncated on a bounded cadence (an
    eager localCheckpoint every 4 rounds, via dedup.py's tracked-RDD
    scheme with eager release of the previous checkpoint) — at 3
    joins/round that keeps plan depth well under the ~20-round planner
    blow-up documented on connected_components while avoiding one
    scheduled job per round.

Determinism contract (hash-exact vs the DuckDB oracle): contributions
are decimal(12,6)-rounded before the sum (decimal addition is exact and
order-independent), the damping update is computed in double from the
EXACT decimal sum, and the new rank is decimal(12,6)-rounded again —
so every engine that follows the same recipe lands on identical bits,
iteration after iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cies_ocr_java_spark.operators.dedup import (
    _checkpoint_tracked_rdds,
    _release_rdds,
)


def syndication_edges(pairs: DataFrame, docs: DataFrame,
                      id_col: str = "doc_id",
                      domain_col: str = "source") -> DataFrame:
    """(id_a, id_b) near-dup pairs -> distinct symmetric cross-domain
    edges (src, dst). Same-domain duplication is internal reuse, not
    syndication, and is filtered out."""
    sa = docs.select(F.col(id_col).alias("id_a"), F.col(domain_col).alias("da"))
    sb = docs.select(F.col(id_col).alias("id_b"), F.col(domain_col).alias("db"))
    e = (
        pairs.select("id_a", "id_b")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("da") != F.col("db"))
        .select("da", "db")
    )
    return (
        e.select(F.col("da").alias("src"), F.col("db").alias("dst"))
        .unionAll(e.select(F.col("db").alias("src"), F.col("da").alias("dst")))
        .distinct()
    )


def pagerank(edges: DataFrame, nodes: DataFrame, iterations: int = 5,
             damping: float = 0.85,
             teleport_to: str | None = None) -> DataFrame:
    """Fixed-iteration PageRank (simplified form: rank = (1-d) + d * sum
    of in-contributions, dangling mass not redistributed — the classic
    Spark-example semantics, which keeps the oracle a pure unrolled CTE).

    ``edges``: (src, dst), already symmetrized/deduped as desired;
    ``nodes``: one column ``source`` covering every node (isolated
    domains settle at 1-d). Returns (source, rank:double).

    ``teleport_to`` switches to PERSONALIZED PageRank (random walk
    with restart): the (1-d) teleport mass lands only on the seed
    node — rank becomes proximity TO THE SEED instead of global
    authority (the crawl-frontier prioritizer). Isolated non-seed
    nodes settle at 0."""
    sc = edges.sparkSession.sparkContext
    # The edge table typically sits on an EXPENSIVE lineage (LSH near-dup
    # derivation); it feeds two consumers (deg + the join) and then every
    # round. persist makes the lineage compute once; the eager
    # localCheckpoint of the degree-joined table cuts the lineage out of
    # all 5 round plans entirely, after which the upstream cache can go.
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed, ed_ids = _checkpoint_tracked_rdds(sc, edges.join(deg, "src"))
    edges.unpersist()
    # nodes feeds every round's left join — without the persist each
    # iteration re-derives it from the source scan. Materialize it NOW:
    # if the cache first fills inside a later _checkpoint_tracked_rdds
    # window, its RDD id is misattributed to that round's delta and the
    # next release evicts it (the cache-misattribution hazard
    # connected_components documents; same protocol as its edges guard).
    nodes = nodes.persist()
    nodes.count()
    if teleport_to is None:
        r0 = F.lit(1.0)
        base = F.lit(1.0 - damping)
    else:
        # Fail loudly on a seed absent from the node set: with no node
        # receiving teleport mass every rank settles at 0.0 and the
        # caller silently gets an all-zero "proximity" table. nodes is
        # already persisted, so this guard is one cheap filter-count.
        if nodes.where(F.col("source") == teleport_to).count() == 0:
            nodes.unpersist()
            raise ValueError(
                f"pagerank: teleport_to seed {teleport_to!r} is not in "
                "the node set — personalized PageRank needs a real seed"
            )
        seed = F.col("source") == teleport_to
        r0 = F.when(seed, F.lit(1.0)).otherwise(F.lit(0.0))
        base = F.when(seed, F.lit(1.0 - damping)).otherwise(F.lit(0.0))
    ranks = nodes.select("source", r0.alias("rank"))
    held: list[int] = []
    # Lineage is truncated every few rounds rather than every round: each
    # eager checkpoint is a scheduled job, and at 3 joins/round the plan
    # only needs cutting before it nests deep enough to hurt the planner
    # (the ~20-round blow-up documented on connected_components).
    checkpoint_every = 4
    for i in range(iterations):
        contrib = ed.join(
            ranks, ed.src == ranks.source
        ).select(
            F.col("dst"),
            (F.col("rank") / F.col("deg")).cast("decimal(12,6)").alias("c"),
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        nxt = nodes.join(
            sums, nodes.source == sums.dst, "left"
        ).select(
            "source",
            (
                base
                + F.lit(damping)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            )
            .cast("decimal(12,6)")
            .cast("double")
            .alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 or i + 1 == iterations:
            ranks, new_ids = _checkpoint_tracked_rdds(sc, nxt)
            _release_rdds(sc, held)
            held = new_ids
        else:
            ranks = nxt
    _release_rdds(sc, ed_ids)
    nodes.unpersist()  # final iterate is checkpointed — safe to release
    return ranks
