"""Crawl-frontier scheduling — politeness-partitioned fetch planning.

A crawler must serialize its requests per host (one queue, a
crawl-delay between fetches — RFC 9309's Crawl-delay is ops/robots.py
territory) while spreading hosts across the fetch fleet. This op turns
a url frontier into that plan deterministically:

* ``shard``: the fetcher that owns the url's host — ``xxhash64(host) %
  num_shards``, so ALL of one host lands on ONE shard and no two
  fetchers ever hit a host concurrently (the politeness invariant);
* ``seq``: the url's position in its host's queue (``row_number`` over
  the host partition, ordered by url — deterministic, gap-free);
* ``fetch_offset_s``: ``seq * delay`` — the earliest start offset into
  the fetch cycle honoring the host's crawl delay;
* ``per_host_cap``: bound each host's queue for the cycle (the
  frontier-pruning budget) — the tail beyond the cap waits for the
  next cycle.

100 TB shape: ONE host-keyed shuffle (the window), integer arithmetic
after it; the cap bounds the skew a mega-host would otherwise put on
one partition AND one fetcher — at web scale the cap is what makes the
host-partitioned window safe, not just polite. No Python, no second
shuffle (``shard`` is a hash, not a repartition — materializing the
queues is the caller's ``repartition("shard")``, one more shuffle by
construction)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F


def schedule_fetches(
    df: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    delay_col: Optional[str] = None,
    default_delay: int = 1,
    num_shards: int = 256,
    per_host_cap: Optional[int] = None,
) -> DataFrame:
    """Append ``shard``/``seq``/``fetch_offset_s`` (see module doc);
    rows past ``per_host_cap`` are dropped for this cycle. ``delay_col``
    names a per-host integer-seconds column (e.g. robots Crawl-delay);
    absent hosts use ``default_delay``."""
    w = Window.partitionBy(host_col).orderBy(url_col)
    delay = (
        F.coalesce(F.col(delay_col), F.lit(default_delay))
        if delay_col
        else F.lit(default_delay)
    )
    out = (
        df.withColumn(
            "shard",
            F.pmod(F.xxhash64(F.col(host_col)), F.lit(num_shards)).cast("int"),
        )
        .withColumn("seq", (F.row_number().over(w) - 1).cast("int"))
        .withColumn("fetch_offset_s", (F.col("seq") * delay).cast("bigint"))
    )
    if per_host_cap is not None:
        out = out.filter(F.col("seq") < F.lit(per_host_cap))
    return out
