"""ANN quality gates: the bucketed scale paths (e3 IVF, e4 multi-probe
LSH) must actually FIND neighbors, not just run — recall measured
against the e1 brute-force ground truth on the same corpus.

Measured on the driver testdata: IVF recall@20 = 0.9; multi-probe LSH
recall@10 with the Hamming≤2 probe set = 0.5 at sf0.01 (the driver-
gate corpus) and 0.4 on the 10×-smaller sf0.001 (0.1 single-probe,
0.4 at h≤1 on both; the synthetic embeddings have weak cosine
structure, so LSH is the cheap-probe demo and IVF the high-recall
path). Floors are set at measurement; both scales are gated so a
probe-set regression shows up regardless of corpus size.
"""

from mistral_ocr_app_spark.operators import catalog

SF_DIR = "/root/testdata/sf0.001"
Q = catalog.queries()


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_ivf_recall_vs_brute_force(spark):
    brute = _ids(Q["e1_cosine_topk"](spark, SF_DIR))
    ivf = _ids(Q["e3_ivf_bucketed_ann"](spark, SF_DIR))
    recall = len(set(brute) & set(ivf)) / len(brute)
    assert recall >= 0.8, f"IVF recall@20 collapsed: {recall}"


def test_multiprobe_lsh_recall_vs_brute_force(spark):
    for sf_dir, floor in [(SF_DIR, 0.4), ("/root/testdata/sf0.01", 0.5)]:
        brute = _ids(Q["e1_cosine_topk"](spark, sf_dir))[:10]
        lsh = _ids(Q["e4_hyperplane_lsh_ann"](spark, sf_dir))
        assert len(lsh) == 10  # multi-probe must fill the top-k
        recall = len(set(brute) & set(lsh)) / 10
        assert recall >= floor, (
            f"multi-probe LSH recall@10 collapsed at {sf_dir}: {recall}"
        )
