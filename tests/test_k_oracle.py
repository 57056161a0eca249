"""geo_k_oracle / geo_layers_oracle fixture semantics: the Chebyshev-
shell closed form the DuckDB oracle derives (peel waves of a full
integer grid advance exactly one shell per wave; street-seeded blocks
peel by row distance). Reference: batch_4_compute_k.py:41-375."""

from kblock_spark.queries import geo_k_oracle, geo_layers_oracle

SF = "/root/testdata/sf0.001"


def test_k_oracle_closed_form(spark):
    got = {r["block_id"]: r for r in geo_k_oracle(spark, SF).collect()}
    assert set(got) == {"A3", "A5", "A7", "B4", "B6", "C4", "E0", "E1"}
    for bid, R in [("A3", 3), ("A5", 5), ("A7", 7), ("C4", 4)]:
        r = got[bid]
        assert r["k"] == R + 1
        assert r["n_bldgs"] == (2 * R + 1) ** 2
        assert r["layers"] == ",".join(
            [str(8 * c) for c in range(R, 0, -1)] + ["1"]
        )
        assert r["on_net_e5"] == 0
    for bid, R in [("B4", 4), ("B6", 6)]:
        r = got[bid]
        assert r["k"] == R + 1
        assert r["layers"] == ",".join(
            [str(2 * R + 1)] + [str(2 * (2 * R + 1))] * R
        )
        assert r["on_net_e5"] > 0 and r["off_net_e5"] == 0
    # off-network interior street: length recorded, peel unaffected
    assert got["C4"]["off_net_e5"] > 0
    assert (got["E0"]["k"], got["E0"]["layers"]) == (1, "0")
    assert (got["E1"]["k"], got["E1"]["layers"]) == (1, "1")


def test_layers_oracle_per_building_assignment(spark):
    rows = geo_layers_oracle(spark, SF).collect()
    assert len(rows) == sum(
        (2 * R + 1) ** 2 for R in (3, 5, 7, 4, 6, 4)
    ) + 1  # + the single E1 building
    for r in rows:
        bid = r["block_id"]
        if bid == "E1":
            assert (r["layer"], r["k"]) == (1, 1)
            continue
        kind, R = ("street", int(bid[1])) if bid[0] == "B" else (
            "boundary", int(bid[1]))
        i, j = map(int, r["url"].split(":")[1:])
        want = abs(j) + 1 if kind == "street" else R - max(abs(i), abs(j)) + 1
        assert r["layer"] == want, (bid, i, j)
        assert r["k"] == R + 1
