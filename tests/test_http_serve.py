"""HTTP serving edge (reference E3 parity: ndd/server_ndd.py:271-315 Flask
routes re-expressed over stdlib http.server): query / base64 query (M15) /
update / evict / size against a live localhost server."""

import base64
import json
import urllib.request

import pytest

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.sources.transcripts import corpus_docs, synth_corpus

CFG = NDDConfig()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def server(ray_session, tmp_path_factory):
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.serve import NddHttpServer

    transcripts, _ = synth_corpus(seed=42)
    res = near_dup_pipeline(rd.from_arrow(transcripts), CFG, include_substring=False)
    root = tmp_path_factory.mktemp("serve")
    sig_path = str(root / "sigs")
    rep_path = str(root / "reps")
    res["signatures"].write_parquet(sig_path)
    res["rep_map"].write_parquet(rep_path)
    srv = NddHttpServer(sig_path, CFG, rep_map_path=rep_path, port=0)
    srv.start()
    base = f"http://{srv.host}:{srv.port}"
    yield base, srv, transcripts, sig_path
    srv.shutdown()


def test_health_and_size(server):
    base, srv, _, _ = server
    st, body = _get(base + "/health")
    assert st == 200 and body["ok"] and body["size"] == len(srv.index.shingles)
    st, body = _get(base + "/size")
    assert st == 200 and body["size"] == len(srv.index.shingles)


def test_query_matches_direct_index(server):
    base, srv, transcripts, _ = server
    docs = corpus_docs(transcripts)
    st, body = _post(base + "/query", {"text": docs["x00000"], "k": 5})
    assert st == 200
    assert body["results"] == srv.index.query_text(docs["x00000"], k=5)
    assert body["results"][0]["conv_id"] == "u00000"


def test_query_base64_edge(server):
    """M15 parity: base64 payload decodes server-side to the same answer."""
    base, srv, transcripts, _ = server
    docs = corpus_docs(transcripts)
    b64 = base64.b64encode(docs["x00000"].encode("utf-8")).decode("ascii")
    st, body = _post(base + "/query", {"text_b64": b64, "k": 5})
    assert st == 200
    assert body["results"] == srv.index.query_text(docs["x00000"], k=5)


def test_update_and_evict_roundtrip(server):
    base, srv, _, sig_path = server
    st, before = _get(base + "/size")
    # evict one conv then re-ingest the checkpoint (idempotent upsert)
    st, body = _post(base + "/evict", {"conv_ids": ["u00000"]})
    assert st == 200 and body["evicted"] == 1
    st, mid = _get(base + "/size")
    assert mid["size"] == before["size"] - 1
    st, body = _post(base + "/update", {"signatures_path": sig_path})
    assert st == 200 and body["ingested"] >= 1
    st, after = _get(base + "/size")
    assert after["size"] == before["size"]


def test_sharded_index_matches_single(server):
    """Round-5 (verdict item #6): ShardedNearDupIndex — 4 conv-sharded
    IndexShardActors, probe signature computed once and fanned out — must
    answer every probe IDENTICALLY to the single in-process index, with
    per-shard sizes summing to the corpus and no shard holding it all."""
    import ray

    from near_duplicate_detection_ray.pipelines.query import ShardedNearDupIndex

    base, srv, transcripts, sig_path = server
    rep_path = sig_path[: -len("sigs")] + "reps"
    sharded = ShardedNearDupIndex(sig_path, 4, CFG, rep_path)
    assert sharded.size() == srv.index.size()
    per_shard = ray.get([a.size.remote() for a in sharded.actors])
    assert sum(per_shard) == sharded.size()
    assert max(per_shard) < sharded.size()  # memory genuinely split
    docs = corpus_docs(transcripts)
    probes = list(docs)[:10]
    for cid in probes:
        assert sharded.query_text(docs[cid], k=5) == srv.index.query_text(
            docs[cid], k=5
        ), cid
    # partial-text containment probe parity (anchor buckets)
    snippet = docs["x00000"][: len(docs["x00000"]) // 2]
    assert sharded.query_text(snippet, k=5) == srv.index.query_text(snippet, k=5)
    # evict + re-ingest route to the right shards
    import ray.data as rd

    n0 = sharded.size()
    assert sharded.evict(["u00000"]) == 1
    assert sharded.size() == n0 - 1
    assert sharded.ingest(rd.read_parquet(sig_path)) >= 1
    assert sharded.size() == n0
    assert sharded.query_text(docs["x00000"], k=5) == srv.index.query_text(
        docs["x00000"], k=5
    )


def test_sharded_index_survives_actor_death(server):
    """A killed shard actor restarts from its checkpoint path and answers
    the same probe identically (serving fault tolerance)."""
    import ray

    from near_duplicate_detection_ray.pipelines.query import ShardedNearDupIndex

    base, srv, transcripts, sig_path = server
    rep_path = sig_path[: -len("sigs")] + "reps"
    sharded = ShardedNearDupIndex(sig_path, 3, CFG, rep_path)
    docs = corpus_docs(transcripts)
    before = sharded.query_text(docs["x00000"], k=5)
    ray.kill(sharded.actors[0], no_restart=False)
    after = sharded.query_text(docs["x00000"], k=5)
    assert after == before and after == srv.index.query_text(docs["x00000"], k=5)


def test_sharded_http_server(ray_session, tmp_path_factory, server):
    """serve.py drops the sharded index in unchanged (n_shards>1)."""
    from near_duplicate_detection_ray.serve import NddHttpServer

    base, srv, transcripts, sig_path = server
    rep_path = sig_path[: -len("sigs")] + "reps"
    s2 = NddHttpServer(sig_path, CFG, rep_map_path=rep_path, port=0, n_shards=3)
    s2.start()
    try:
        b2 = f"http://{s2.host}:{s2.port}"
        st, body = _get(b2 + "/health")
        assert st == 200 and body["size"] == srv.index.size()
        docs = corpus_docs(transcripts)
        st, body = _post(b2 + "/query", {"text": docs["x00000"], "k": 5})
        assert st == 200
        assert body["results"] == srv.index.query_text(docs["x00000"], k=5)
    finally:
        s2.shutdown()


def test_demo_page(server):
    """GET / serves the HTML demo page (reference client_flask.py parity)."""
    base, _, _, _ = server
    with urllib.request.urlopen(base + "/", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        body = r.read().decode("utf-8")
    assert "Near-duplicate search" in body and "/query" in body


def test_error_paths(server):
    base, _, _, _ = server
    st, body = _post(base + "/query", {"k": 3})
    assert st == 400 and "text" in body["error"]
    st, body = _post(base + "/nope", {})
    assert st == 404
    st, body = _post(base + "/update", {})
    assert st == 400
