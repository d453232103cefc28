

# ------------------------------------------------------ hard-negative mining

def test_hard_negatives_are_cross_label_topk(spark):
    from bid_evaluation_spark.operators.similarity import hard_negatives
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.14], 1),      # hardest cross-label for 0
        (2, [0.7, 0.7], 1),
        (3, [0.95, 0.31], 0),      # same label: NEVER a negative
        (4, [0.0, 1.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = hard_negatives(df, k=2,
                         anchors=df.filter("vec_id = 0")).collect()
    assert [r["negative_id"] for r in got] == [1, 2]
    assert all(r["anchor_id"] == 0 for r in got)
    assert all(r["negative_label"] != 0 for r in got)
    assert got[0]["rnk"] == 1 and got[0]["cosine"] > got[1]["cosine"]


def test_hard_negatives_max_cosine_routes_out_mislabeled_dups(spark):
    from bid_evaluation_spark.operators.similarity import hard_negatives
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.001], 1),      # near-identical, different label
        (2, [0.7, 0.7], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    all_n = hard_negatives(df, k=2, anchors=df.filter("vec_id = 0"))
    assert [r["negative_id"] for r in all_n.collect()] == [1, 2]
    gated = hard_negatives(df, k=2, max_cosine=0.95,
                           anchors=df.filter("vec_id = 0"))
    assert [r["negative_id"] for r in gated.collect()] == [2]
