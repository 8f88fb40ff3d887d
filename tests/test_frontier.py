"""ops/frontier.py — politeness-partitioned fetch scheduling."""

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.frontier import schedule_fetches


def _frontier(spark):
    rows = []
    for h in ("a.com", "b.com", "c.com"):
        for p in range(4):
            rows.append((h, f"https://{h}/p/{p}", 2 if h == "b.com" else None))
    return spark.createDataFrame(rows, "host string, url string, delay int")


def test_schedule_invariants(spark):
    out = schedule_fetches(
        _frontier(spark), delay_col="delay", num_shards=8
    ).collect()
    byhost = {}
    for r in out:
        byhost.setdefault(r.host, []).append(r)
    for h, rs in byhost.items():
        rs.sort(key=lambda r: r.url)
        # one shard per host; gap-free deterministic queue positions
        assert len({r.shard for r in rs}) == 1
        assert 0 <= rs[0].shard < 8
        assert [r.seq for r in rs] == [0, 1, 2, 3]
        delay = 2 if h == "b.com" else 1  # coalesce(default_delay)
        assert [r.fetch_offset_s for r in rs] == [0, delay, 2 * delay, 3 * delay]


def test_schedule_deterministic_and_capped(spark):
    a = schedule_fetches(_frontier(spark), num_shards=16).collect()
    b = schedule_fetches(_frontier(spark), num_shards=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    capped = schedule_fetches(_frontier(spark), per_host_cap=2)
    assert capped.count() == 6
    assert capped.agg(F.max("seq")).collect()[0][0] == 1
