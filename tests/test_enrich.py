"""Enrichment operators (J1): broadcast dim + distinct-before-lookup,
mirroring the reference's iplookup contract (iplookup_test.go:20-39:
public IPs resolve, private IPs error → NULL enrichment)."""

from __future__ import annotations

from event_stream_aggr_spark.operators.enrich import enrich_with_dim, enrich_with_lookup


def test_lookup_enrichment_distinct_before_call(spark):
    n_keys_looked_up = spark.sparkContext.accumulator(0)

    def fake_geo_lookup(ips: list) -> list[dict]:
        # stubbed lookup service: resolves public IPs, errors on
        # private 192.168.* (the iplookup fixture, hermetic)
        n_keys_looked_up.add(len(ips))
        return [
            {"src_addr": ip, "country": "XX", "asn": 13335}
            for ip in ips
            if not ip.startswith("192.168.")
        ]

    rows = [("1.1.1.1",), ("1.1.1.1",), ("8.8.8.8",), ("192.168.0.1",), ("1.1.1.1",)]
    df = spark.createDataFrame(rows, "src_addr string")
    out = enrich_with_lookup(
        df, "src_addr", fake_geo_lookup, "src_addr string, country string, asn long"
    )
    got = [(r.src_addr, r.country, r.asn) for r in out.collect()]
    assert got.count(("1.1.1.1", "XX", 13335)) == 3   # fanned back to all rows
    assert ("192.168.0.1", None, None) in got          # error → NULL, row kept
    # distinct-before-lookup (iplookup.go:30-34): 3 unique keys, 5 rows
    assert n_keys_looked_up.value == 3


def test_dim_enrichment_broadcast(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (9, "c")], "k int, v string")
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k int, label string")
    out = enrich_with_dim(fact, dim, "k")
    got = {r.v: r.label for r in out.collect()}
    assert got == {"a": "one", "b": "two", "c": None}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_lookup_schema_with_commas_in_types(spark):
    # decimal(10,2) would break naive comma-splitting of the DDL
    def price_lookup(skus: list) -> list[dict]:
        from decimal import Decimal

        return [{"sku": s, "price": Decimal(f"{len(s)}.50"), "tags": {"t": 1}} for s in skus]

    df = spark.createDataFrame([("ab",), ("abc",), ("ab",)], "sku string")
    out = enrich_with_lookup(
        df, "sku", price_lookup, "sku string, price decimal(10,2), tags map<string,int>"
    )
    assert out.columns == ["sku", "price", "tags"]
    got = {r.sku: (str(r.price), dict(r.tags)) for r in out.collect()}
    assert got == {"ab": ("2.50", {"t": 1}), "abc": ("3.50", {"t": 1})}
