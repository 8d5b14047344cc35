#!/usr/bin/env python3
"""Adversarial-UTF-8 end-to-end differential: generate a nasty
documents fixture (multi-byte, ZWJ, exotic whitespace, casing hazard
chars, 1e5-char tokens, null text), then run the regular Spark-vs-
DuckDB oracle gate (tools/check.py) over it for the text-key queries.

Isolated surrogates are deliberately absent: parquet strings are
UTF-8, which cannot encode them — they cannot reach either engine
through this pipeline.

The query list is derived MECHANICALLY (round-11 advice #5): every
registry query whose oracle SQL reads the documents table and no
other table runs against the nasty fixture — a curated list would
rot as queries are added. The derivation needs oracle_sql.json, so a
one-query bootstrap run produces it first (graft.Verify dumps ALL
oracles on every run). Queries without an oracle have no differential
to run and are naturally absent from the dump's scope here.

Usage: python3 tools/nasty_check.py [outDir]
"""
import json
import re
import subprocess
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

# tables registered by check.py; a documents-only oracle is one that
# names no OTHER table (the nasty fixture ships only documents)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BOOTSTRAP_QUERY = "q45_dedup_exact"


def _tables_in(sql: str) -> set:
    """Fixture tables an oracle actually references: lowercased, with
    string literals and comments stripped first (a table word inside
    either is not a reference), and CTE names excluded (a CTE named
    e.g. 'orders' shadows the table for the rest of the query)."""
    s = sql.lower()
    s = re.sub(r"'(?:[^']|'')*'", "''", s)        # string literals
    s = re.sub(r"--[^\n]*", " ", s)               # line comments
    s = re.sub(r"/\*.*?\*/", " ", s, flags=re.S)  # block comments
    ctes = set(re.findall(
        r"\b([a-z_][a-z0-9_]*)\s+as\s+(?:materialized\s+)?\(", s))
    return {t for t in TABLES
            if t not in ctes and re.search(rf"\b{t}\b", s)}


def derive_queries(oracle_json: Path) -> list:
    sqls = json.load(open(oracle_json))
    return [name for name, sql in sorted(sqls.items())
            if _tables_in(sql) == {"documents"}
            # CONTRACT oracles (pinned literal booleans, e.g. q250's
            # "TRUE AS beats_majority") assert seeded-model quality on
            # the shipped fixtures, not engine parity — on an
            # adversarial degenerate corpus the invariant is not a
            # differential claim, so they are out of the sweep's scope
            and not re.search(r"\bTRUE\s+AS\b", sql, re.I)]

NASTY_TOKENS = [
    "plain", "漢字テキスト", "étude",
    "étude", "\U0001F600\U0001F600",
    "\U0001F469‍\U0001F469‍\U0001F467", "a‍b",
    "İstanbul", "ΦΩΣ", "ΣΑΣ",
    "ς", "ß", "ı",
    "a\u00a0b", "a\u3000b", "a\u2028b", "a\u0085b", "a\u000bb",
    "x" * 100000,
]
SEPARATORS = [" ", "  ", "\t", "\n", " \r ", "\f", " "]


def gen_docs():
    # deterministic LCG so the corpus is stable across runs
    state = 42

    def rnd(n):
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**63
        return state % n

    docs = []
    for i in range(240):
        n = rnd(13)
        toks = [NASTY_TOKENS[rnd(len(NASTY_TOKENS))] for _ in range(n)]
        seps = [SEPARATORS[rnd(len(SEPARATORS))] for _ in range(max(n - 1, 0))]
        body = "".join(t + s for t, s in zip(toks, seps + [""]))
        lead = ["", " ", "\t "][rnd(3)]
        trail = ["", " ", " \n"][rnd(3)]
        docs.append(lead + body + trail)
    # planted exact duplicates (so q45/q50 key-equality paths fire on
    # the nasty plane, not just hash totality) and planted dup spans
    docs[200] = docs[0]
    docs[201] = docs[1]
    long_run = " ".join(NASTY_TOKENS[:12])
    docs[202] = "unique0 " + long_run + " tail0"
    docs[203] = "unique1 " + long_run + " tail1"
    # edge rows: empty, whitespace-only, null
    docs[204] = ""
    docs[205] = " \t\n "
    rows = [(i, d) for i, d in enumerate(docs)]
    rows.append((len(rows), None))  # null text
    return rows


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nasty_fixture")
    out.mkdir(parents=True, exist_ok=True)
    rows = gen_docs()
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["xx"] * len(rows), pa.string()),
        "source": pa.array([f"src{r[0] % 4}" for r in rows], pa.string()),
        "n_chars": pa.array(
            [len(r[1]) if r[1] is not None else 0 for r in rows],
            pa.int64()),
    })
    pq.write_table(table, out / "documents.parquet")
    print(f"nasty fixture: {len(rows)} docs -> {out}")
    check = str(Path(__file__).parent / "check.py")
    results = out / "results"
    # bootstrap: one cheap query run dumps oracle_sql.json for ALL
    # queries, from which the documents-only set is derived
    rc = subprocess.call(
        [sys.executable, check, str(out), str(results),
         BOOTSTRAP_QUERY, "--run"])
    if rc != 0:
        sys.exit(rc)
    queries = derive_queries(results / "oracle_sql.json")
    print(f"derived {len(queries)} documents-only text queries")
    rc = subprocess.call(
        [sys.executable, check, str(out), str(results), *queries, "--run"])
    sys.exit(rc)


if __name__ == "__main__":
    main()
