"""Transcript table sources.

The engine's primary input is a Parquet table of multi-turn transcripts
(BASELINE.json input_hint):

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Three ways to obtain one:

1. ``read_transcripts(path)`` — read an existing Parquet table.
2. ``transcripts_from_documents(sf_dir)`` — deterministic, SQL-mirrorable
   derivation from the driver's ``documents`` table (one doc → one turn,
   conv = doc_id % 100). The DuckDB oracle expresses the identical
   derivation (``TRANSCRIPTS_SQL``), which is what makes every
   transcript-pipeline query correctness-checkable.
3. ``generate_transcripts(...)`` — seed-deterministic synthetic corpus with
   planted duplicate families (FIXTURES.md §1): exact copies, near dups,
   simhash-near variants, long shared spans, hot trivial rows, empty/edge
   rows. Used by tests and the bench harness; never reads the wall clock.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

N_CONVS_FROM_DOCS = 100
_EPOCH_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds

# DuckDB CTE mirroring transcripts_from_documents; prepend to oracle SQL.
TRANSCRIPTS_SQL = f"""
WITH transcripts AS (
    SELECT
        'conv-' || CAST(doc_id % {N_CONVS_FROM_DOCS} AS VARCHAR) AS conv_id,
        CAST(doc_id // {N_CONVS_FROM_DOCS} AS INTEGER) AS turn_idx,
        CASE (doc_id // {N_CONVS_FROM_DOCS}) % 3
            WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
        text,
        CASE WHEN (doc_id // {N_CONVS_FROM_DOCS}) % 3 = 2
             THEN 'search' ELSE '' END AS tool,
        TIMESTAMP '2025-01-01 00:00:00'
            + (doc_id // {N_CONVS_FROM_DOCS}) * INTERVAL 1 MINUTE AS ts
    FROM documents
)
"""


def read_transcripts(path: str):
    return ray.data.read_parquet(path)


def read_transcripts_jsonl(path: str):
    """JSON-lines transcript source (engine addition — web-scale corpora
    frequently arrive as jsonl shards before any Parquet conversion).
    Normalizes the loosely-typed JSON columns to the transcript schema:
    turn_idx → int32, ts accepted as epoch-microseconds int or ISO
    string → timestamp[us]; missing optional columns (role/tool) become
    empty strings. Distributed read via ``ray.data.read_json``."""
    ds = ray.data.read_json(path)

    def norm(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {"conv_id": pc.cast(batch["conv_id"], pa.string()),
                "turn_idx": pc.cast(batch["turn_idx"], pa.int32())}
        for opt in ("role", "tool"):
            cols[opt] = (pc.cast(batch[opt], pa.string())
                         if opt in batch.column_names else
                         pa.array([""] * batch.num_rows, pa.string()))
        cols["text"] = pc.cast(batch["text"], pa.string())
        if "ts" in batch.column_names:
            # read_json may infer timestamps natively; otherwise accept
            # epoch-microsecond ints or ISO strings (Arrow's string →
            # timestamp cast parses ISO with either separator)
            cols["ts"] = pc.cast(batch["ts"], pa.timestamp("us"))
        else:
            cols["ts"] = pa.array([0] * batch.num_rows,
                                  pa.timestamp("us"))
        return pa.table(cols)

    return ds.map_batches(norm, batch_format="pyarrow")


def transcripts_from_documents(sf_dir: str):
    """documents.parquet → transcript Dataset (see TRANSCRIPTS_SQL)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=64,
    )

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy()
        conv = doc_id % N_CONVS_FROM_DOCS
        turn = (doc_id // N_CONVS_FROM_DOCS).astype(np.int32)
        roles = np.array(["user", "assistant", "tool"], dtype=object)[turn % 3]
        tools = np.where(turn % 3 == 2, "search", "")
        ts = (_EPOCH_US + turn.astype(np.int64) * 60_000_000)
        return pa.table(
            {
                "conv_id": pa.array([f"conv-{c}" for c in conv], type=pa.string()),
                "turn_idx": pa.array(turn, type=pa.int32()),
                "role": pa.array(roles, type=pa.string()),
                "text": batch["text"],
                "tool": pa.array(tools, type=pa.string()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
            }
        )

    return docs.map_batches(derive, batch_format="pyarrow")


def expand_documents_to_transcripts(sf_dir: str, repeats: int = 8,
                                    num_blocks: int = 64):
    """Bench-scale deterministic expansion with CONSTANT duplicate-family
    size: each doc becomes ``repeats`` turns organized as groups of 8;
    each group gets a unique salt phrase (pushing cross-group shingle
    Jaccard well below the dup threshold, so family size stays 8 and the
    verified-pair count grows LINEARLY with input size — a quadratic pair
    blow-up would make scaling benchmarks measure pair volume, not
    throughput). Within a group: members 0-1 are verbatim (one exact-dup
    pair), members 2-7 rewrite m-1 words (graded near dups). Pure
    map_batches, no driver loop, no RNG.

    ``num_blocks`` sets the source fan-out and therefore the signature
    task count (block fan-out is the source's job — neardup.py note);
    the 8→32-cpu scaling experiment varies it via BENCH_EXPAND_BLOCKS.
    """
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"],
                                 override_num_blocks=num_blocks)

    def expand(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        conv, turn, role, out_t, tool, ts = [], [], [], [], [], []
        for d, t in zip(doc_ids, texts):
            base_words = (t or "").split()
            for r in range(repeats):
                g, m = r // 8, r % 8
                # every 3rd word replaced by a (doc, group)-unique token:
                # every 3-word shingle then contains a salted word, so
                # cross-group shingle overlap is exactly zero — no
                # candidate leakage between groups
                words = [
                    f"g{g}s{int(d)}p{k}" if k % 3 == 0 else base_words[k]
                    for k in range(len(base_words))
                ]
                if m <= 1 or not base_words:
                    new = " ".join(words)
                else:
                    w = list(words)
                    for e in range(m - 1):
                        w[(int(d) + 7 * e) % len(w)] = f"edit{m}x{e}"
                    new = " ".join(w)
                conv.append(f"conv-{int(d) % N_CONVS_FROM_DOCS}")
                turn.append(int(d) // N_CONVS_FROM_DOCS * repeats + r)
                role.append(["user", "assistant", "tool"][r % 3])
                out_t.append(new)
                tool.append("search" if r % 3 == 2 else "")
                ts.append(_EPOCH_US + (int(d) * repeats + r) * 60_000_000)
        return pa.table(
            {
                "conv_id": pa.array(conv, type=pa.string()),
                "turn_idx": pa.array(turn, type=pa.int32()),
                "role": pa.array(role, type=pa.string()),
                "text": pa.array(out_t, type=pa.string()),
                "tool": pa.array(tool, type=pa.string()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
            }
        )

    return docs.map_batches(expand, batch_format="pyarrow")


def expand_documents_to_transcripts_skewed(sf_dir: str, repeats: int = 8,
                                           boiler_frac: float = 0.3,
                                           template_words: int = 20,
                                           noise_words: int = 60):
    """PATHOLOGICAL-SKEW variant of :func:`expand_documents_to_transcripts`
    for the hot-bucket bench: ``boiler_frac`` of the duplicate-family
    groups are BOILERPLATE groups whose text is one GLOBAL
    ``template_words``-word block followed by per-group unique noise —
    every boilerplate doc shares the template's interior shingles, so the
    band buckets whose minima all land in the template collect a
    corpus-wide hot membership (tens of thousands of docs at 1M+ turns,
    far past ``lsh_bucket_salt_above``) while cross-group Jaccard stays
    ~template/(2·total) << the dup threshold — hot CANDIDATE buckets
    with no true-pair blow-up, exactly the salting stress case. Group
    structure (members 0-1 verbatim, 2-7 with m-1 word edits) is
    preserved, so the TRUE pair set per group matches the uniform
    corpus's semantics. Deterministic, no RNG, pure map_batches."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"],
                                 override_num_blocks=64)
    cut = int(boiler_frac * 1000)

    def expand(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        conv, turn, role, out_t, tool, ts = [], [], [], [], [], []
        tmpl = [f"tmplw{k}" for k in range(template_words)]
        for d, t in zip(doc_ids, texts):
            base_words = (t or "").split()
            for r in range(repeats):
                g, m = r // 8, r % 8
                boiler = ((int(d) * 2654435761 + g * 40503) % 1000) < cut
                if boiler:
                    words = tmpl + [f"n{int(d)}g{g}x{j}"
                                    for j in range(noise_words)]
                else:
                    words = [
                        f"g{g}s{int(d)}p{k}" if k % 3 == 0 else base_words[k]
                        for k in range(len(base_words))
                    ]
                if m <= 1 or not words:
                    new = " ".join(words)
                else:
                    w = list(words)
                    for e in range(m - 1):
                        w[(int(d) + 7 * e) % len(w)] = f"edit{m}x{e}"
                    new = " ".join(w)
                conv.append(f"conv-{int(d) % N_CONVS_FROM_DOCS}")
                turn.append(int(d) // N_CONVS_FROM_DOCS * repeats + r)
                role.append(["user", "assistant", "tool"][r % 3])
                out_t.append(new)
                tool.append("search" if r % 3 == 2 else "")
                ts.append(_EPOCH_US + (int(d) * repeats + r) * 60_000_000)
        return pa.table(
            {
                "conv_id": pa.array(conv, type=pa.string()),
                "turn_idx": pa.array(turn, type=pa.int32()),
                "role": pa.array(role, type=pa.string()),
                "text": pa.array(out_t, type=pa.string()),
                "tool": pa.array(tool, type=pa.string()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
            }
        )

    return docs.map_batches(expand, batch_format="pyarrow")


_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu stream batch window filter merge sort join hash scan "
    "vector column table query group order value data spark fast slow small "
    "big key line part customer row agg the a"
).split()


def _make_text(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(rng.choice(_VOCAB, size=n_words))


def _mutate(rng: np.random.Generator, text: str, n_edits: int) -> str:
    words = text.split()
    for _ in range(n_edits):
        pos = int(rng.integers(0, len(words)))
        words[pos] = str(rng.choice(_VOCAB))
    return " ".join(words)


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    turns_low: int = 1,
    turns_high: int = 30,
    p_exact: float = 0.08,
    p_near: float = 0.08,
    p_hot: float = 0.05,
    p_edge: float = 0.02,
) -> pa.Table:
    """Deterministic synthetic transcript table with planted duplicate
    families. Returns an Arrow table (callers wrap with
    ``ray.data.from_arrow`` or write to Parquet).

    Family plumbing: a shared pool of "base" texts; each generated turn is
    (a) a fresh unique text, (b) an exact copy of a pool text, (c) a light
    mutation of a pool text (1-3 word edits on 25-60-word texts keeps
    shingle Jaccard well above the 0.8 dup threshold), (d) a hot trivial
    row ("ok", tool boilerplate), or (e) an edge row (empty/whitespace/
    single-token/very long). Ground truth for tests is NOT this structure
    but a brute-force single-process oracle over the emitted rows
    (testing/oracle.py) — the generator only guarantees the structure
    exists.
    """
    rng = np.random.default_rng(seed)
    pool: list[str] = []
    hot_rows = ["ok", "yes", "done", "Tool output: exit status 0"]
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    role_cycle = ["user", "assistant", "tool"]
    for c in range(n_convs):
        conv = f"conv-{c:08d}"
        n_turns = int(rng.integers(turns_low, turns_high + 1))
        for t in range(n_turns):
            r = rng.random()
            if r < p_edge:
                choice = int(rng.integers(0, 4))
                if choice == 0:
                    text = ""
                elif choice == 1:
                    text = "   "
                elif choice == 2:
                    text = str(rng.choice(_VOCAB))
                else:
                    text = _make_text(rng, 2000)
            elif r < p_edge + p_hot:
                text = hot_rows[int(rng.integers(0, len(hot_rows)))]
            elif r < p_edge + p_hot + p_exact and pool:
                text = pool[int(rng.integers(0, len(pool)))]
            elif r < p_edge + p_hot + p_exact + p_near and pool:
                base = pool[int(rng.integers(0, len(pool)))]
                text = _mutate(rng, base, int(rng.integers(1, 4)))
            else:
                text = _make_text(rng, int(rng.integers(25, 61)))
                pool.append(text)
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(role_cycle[t % 3])
            texts.append(text)
            tools.append("search" if t % 3 == 2 else "")
            tss.append(_EPOCH_US + (c * 3600 + t * 60) * 1_000_000)

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idxs, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(tss, type=pa.timestamp("us")),
        }
    )
