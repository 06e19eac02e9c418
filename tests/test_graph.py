"""Connected components (operators/graph.py): transitive clustering of
near-dup pairs, convergence on chains/cliques, determinism."""

from pyspark.sql import Row

from mini_data_platform_spark.operators.graph import connected_components


def _pairs(spark, edges):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges], "id_a long, id_b long"
    )


class TestConnectedComponents:
    def test_transitive_chain_merges(self, spark):
        # 1-2, 2-3, 3-4 never scored 1~4 directly; one cluster anyway
        out = {
            r["v"]: r["comp"]
            for r in connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4)])).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_separate_components_stay_separate(self, spark):
        out = {
            r["v"]: r["comp"]
            for r in connected_components(
                _pairs(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
            ).collect()
        }
        assert out == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_long_chain_converges(self, spark):
        # a 12-vertex path needs several propagation rounds (diameter 11,
        # but min-label doubles its reach via the union step): still one
        # component labeled by the minimum id
        edges = [(i, i + 1) for i in range(100, 111)]
        out = connected_components(_pairs(spark, edges), max_iter=15).collect()
        assert {r["comp"] for r in out} == {100}
        assert len(out) == 12

    def test_reversed_edge_direction_irrelevant(self, spark):
        a = connected_components(_pairs(spark, [(5, 3), (3, 9)])).collect()
        b = connected_components(_pairs(spark, [(3, 5), (9, 3)])).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
