"""Bloom-screened decontamination pins: output identical to the exact path,
including under a deliberately terrible false-positive rate (the confirm join
must drop every FP), and the empty-eval edge."""

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _ids(ds):
    return sorted(ds.to_pandas()["doc_id"].tolist())


def test_bloom_path_equals_exact(ray_session):
    from near_duplicate_detection_ray.pipelines.curate import (
        decontaminate_docs,
        decontaminate_docs_bloom,
    )

    exact = _ids(decontaminate_docs(SF))
    bloom = _ids(decontaminate_docs_bloom(SF))
    assert bloom == exact and len(exact) > 0


def test_bloom_path_survives_high_fp_rate(ray_session):
    """fp_rate=0.5 floods the candidate stream with false positives; the
    exact confirm join must still produce the identical survivor set."""
    from near_duplicate_detection_ray.pipelines.curate import (
        decontaminate_docs,
        decontaminate_docs_bloom,
    )

    exact = _ids(decontaminate_docs(SF))
    noisy = _ids(decontaminate_docs_bloom(SF, fp_rate=0.5))
    assert noisy == exact


def test_bloom_path_empty_eval_split(ray_session):
    """pct=0 puts nothing in the eval split: no grams, no bloom, every doc
    survives."""
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.pipelines.curate import (
        decontaminate_docs_bloom,
    )

    out = _ids(decontaminate_docs_bloom(SF, pct=0))
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(out) == n_docs
