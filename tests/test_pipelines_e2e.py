"""End-to-end tests for the off-topic and storytelling pipeline DAGs and
the CLI runner."""

import json
import subprocess
import sys

import pyarrow as pa
import pytest

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.pipelines.offtopic import detect_off_topic, topic_lists
from raydedup.pipelines.storytelling import storytelling_chain
from raydedup.sources.transcripts import generate_transcripts
from raydedup.stages.slicing import slice_params


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=40, seed=9)


def test_offtopic_pipeline(corpus):
    ds = ray.data.from_arrow(corpus)
    classified = detect_off_topic(
        ds, measures=["bytecount", "jaccard", "raw_simhash"]
    )
    rows = classified.take_all()
    assert len(rows) == corpus.num_rows
    statuses = {r["overall_status"] for r in rows}
    assert statuses <= {"on-topic", "off-topic"}
    # word-salad turns vs unrelated anchors: both classes should exist
    assert "off-topic" in statuses and "on-topic" in statuses
    off, on = topic_lists(classified)
    assert off.count() + on.count() == corpus.num_rows


def test_storytelling_chain(corpus):
    ds = ray.data.from_arrow(corpus)
    slices, clusters, survivors, story = storytelling_chain(ds, DEFAULT_CONFIG)
    n = corpus.num_rows
    _, per = slice_params(n)
    expected_sliced = per * ((n - 1) // per) + 1  # flush/drop quirk
    slice_rows = slices.take_all()
    assert len(slice_rows) == expected_sliced
    assert clusters.count() == expected_sliced
    # survivors = chain-scan keep list over all conversations
    assert 0 < survivors.count() <= n
    # every story row is a (slice, cluster) representative of a real cluster
    for r in story.take_all():
        assert r["cluster_id"] != "-1"


def test_exact_dedup_collapses_hot_rows():
    """FIXTURES family 5: thousands of identical trivial rows must collapse
    to ONE representative before LSH (the hot-bucket guard)."""
    n = 3000
    tbl = pa.table(
        {
            "conv_id": [f"c{i:05d}" for i in range(n)],
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "text": ["ok"] * n,
        }
    )
    from raydedup.pipelines.neardup import near_dup_pipeline

    clusters, pairs = near_dup_pipeline(
        ray.data.from_arrow(tbl), DEFAULT_CONFIG
    )
    assert pairs.count() == 0  # one rep → no near-dup pairs at all
    rows = clusters.take_all()
    assert len({r["cluster_id"] for r in rows}) == 1
    assert sum(not r["is_duplicate"] for r in rows) == 1


def test_cli_neardup_and_resume(tmp_path):
    run_dir = tmp_path / "run"
    cmd = [
        sys.executable, "-m", "raydedup.cli", "neardup",
        "--input", "/root/testdata/sf0.001",
        "--run-dir", str(run_dir), "--num-cpus", "4",
    ]
    out1 = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    assert out1.returncode == 0, out1.stderr[-2000:]
    summary1 = json.loads(out1.stdout.strip().splitlines()[-1])
    assert summary1["rows"] == 500 and summary1["clusters"] == 500
    # resume run must produce the identical summary (skip-completed)
    out2 = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    assert out2.returncode == 0, out2.stderr[-2000:]
    summary2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert summary2 == summary1


def test_uri_scores_injectable_damage():
    """The damage scorer is the injection point for the reference's REST
    client (bin/select_high_quality:92-120); verify the combined weight
    formula -0.40*damage + 0.15*category + 0.45*depth against a mocked
    deterministic service."""
    from raydedup.stages.quality import uri_scores

    tbl = pa.table({
        "row_key": ["a", "b", "c"],
        "uri": [
            "https://twitter.com/x/status/1",        # category 1.0
            "https://example.org/one/two/three",      # category 0.0
            "https://news.site/article",              # category 0.3
        ],
    })

    def fake_damage(uris):
        # deterministic stand-in for the memento-damage REST service
        return [len(u) % 7 / 10.0 for u in uris]

    out = {r["row_key"]: r for r in
           uri_scores(ray.data.from_arrow(tbl), damage_fn=fake_damage)
           .take_all()}
    for key, uri in zip(tbl["row_key"].to_pylist(), tbl["uri"].to_pylist()):
        r = out[key]
        assert r["damage_score"] == pytest.approx(len(uri) % 7 / 10.0)
        expect = (-0.40 * r["damage_score"] + 0.15 * r["category_score"]
                  + 0.45 * r["depth_score"])
        assert r["quality_score"] == pytest.approx(expect)
    # default path stays the documented 0.0 stub
    stub = uri_scores(ray.data.from_arrow(tbl)).take_all()
    assert all(r["damage_score"] == 0.0 for r in stub)


def test_damage_client_actor_pool(ray_session):
    """DamageClient: reference endpoint shape + failure semantics
    (bin/select_high_quality:92-120), plus the engine's rate limit,
    retries, and per-actor cache — driven through a real actor-pool
    map_batches and composed with uri_scores(damage_col=...)."""
    import pytest

    from raydedup.stages.quality import DamageClient, uri_scores

    seen = []

    def fake_transport(url):
        seen.append(url)
        if "boom" in url:
            raise IOError("transient")
        if "malformed" in url:
            return {"unexpected": 1}
        tail = url.rsplit("/", 1)[-1]
        return {"total_damage": 0.01 * len(tail)}

    # unit: endpoint format, cache, failure-to-zero, malformed-to-zero
    c = DamageClient(damage_uri="http://svc/", transport=fake_transport,
                     max_qps=0, retries=1, sleep=lambda s: None)
    v = c.score("http://a/x")
    assert seen[-1] == "http://svc/api/damage/http://a/x"
    assert v == pytest.approx(0.01)  # rsplit tail is "x"
    n_calls = c.calls
    assert c.score("http://a/x") == v and c.calls == n_calls  # cached
    assert c.score("http://boom/") == 0.0          # retries exhausted
    assert c.calls == n_calls + 2                  # 1 + 1 retry
    assert c.score("http://malformed/") == 0.0
    assert c.score("") == 0.0
    assert DamageClient().score("http://a/") == 0.0  # no endpoint -> 0

    # rate limiter: calls spaced >= 1/max_qps on the injected clock
    t = {"now": 0.0}
    waits = []
    rl = DamageClient(damage_uri="http://svc", transport=fake_transport,
                      max_qps=4.0, clock=lambda: t["now"],
                      sleep=lambda s: (waits.append(s),
                                       t.__setitem__("now",
                                                     t["now"] + s)))
    rl.score("u1")
    rl.score("u2")
    assert waits and waits[-1] == pytest.approx(0.25)

    with pytest.raises(ValueError, match="transport"):
        DamageClient(damage_uri="http://svc")

    # actor pool + uri_scores(damage_col=...) composition
    tbl = pa.table({"uri": [
        "http://news.example/a/b", "http://twitter.com/x", ""]})
    scored = ray.data.from_arrow(tbl).map_batches(
        DamageClient,
        fn_constructor_kwargs=dict(damage_uri="http://svc",
                                   transport=fake_transport,
                                   max_qps=0),
        concurrency=2, batch_format="pyarrow")
    out = {r["uri"]: r for r in
           uri_scores(scored, damage_col="damage_score").take_all()}
    assert set(out) == {"http://news.example/a/b",
                        "http://twitter.com/x", ""}
    r = out["http://news.example/a/b"]
    assert r["damage_score"] == pytest.approx(0.01)  # tail is "b"
    assert r["quality_score"] == pytest.approx(
        -0.40 * r["damage_score"] + 0.15 * r["category_score"]
        + 0.45 * r["depth_score"])

    with pytest.raises(ValueError, match="not both"):
        uri_scores(scored, damage_fn=lambda u: [0.0] * len(u),
                   damage_col="damage_score")


def test_prepare_training_transcripts_manifest(ray_session):
    """The composed prep query: manifest shards partition the
    near-dup-surviving conversations exactly, token totals add up, and
    duplicate conversations (an exact re-run of another conv) never
    reach a shard."""
    import pyarrow as pa

    import __ray_entry__ as entry

    rows = entry.q_prepare_training_transcripts(
        "/root/testdata/sf0.001").take_all()
    assert rows and {r["shard"] for r in rows} <= {0, 1, 2, 3}
    n_convs = sum(r["n_convs"] for r in rows)
    assert 0 < n_convs <= 100          # survivors of the 100 convs
    assert all(r["n_tokens"] > 0 for r in rows)
    assert all(r["min_conv"] <= r["max_conv"] for r in rows)
