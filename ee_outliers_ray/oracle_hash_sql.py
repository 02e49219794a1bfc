"""DuckDB-SQL re-implementations of the 64-bit hash kernels
(`hashing.py`) — independent oracles for the deterministic hash-based
pipelines (document fingerprints, SimHash near-dup pairs).

The kernels are pure integer arithmetic mod 2^64, so they are exactly
expressible in SQL: UHUGEINT (uint128) carries the 64x64-bit products,
``% 2^64`` reduces them, and xor runs on the signed int64 bit-pattern
view (DuckDB's ``xor`` is BIGINT-typed).  Power tables (R^k, C^k, 2^b
mod 2^64) are embedded as VALUES literals computed in Python — the same
public splitmix64 / polynomial-rolling-hash spec as `hashing.py`, just
evaluated by a different engine.  `tests/test_oracle_hash_sql.py` pins
SQL == numpy bit-exactly on adversarial strings and real testdata.

Power-table sizes bound the SQL's domain: token length <= _MAX_TOK_LEN
and tokens/doc <= _MAX_DOC_TOKS (testdata max: 8 and 100).  Tokens
longer than the table would silently drop from the inner join, so the
parity test also asserts the bounds hold for the tested corpora.
"""

from __future__ import annotations

from .hashing import _C, _R

_U64 = 1 << 64
_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB
_MAX_TOK_LEN = 64
_MAX_DOC_TOKS = 2048

_TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_MOD = "18446744073709551616::UHUGEINT"          # 2^64


def _sg(e: str) -> str:
    """Signed int64 bit-pattern view of a UHUGEINT expr in [0, 2^64)."""
    return (f"(CASE WHEN {e} >= 9223372036854775808::UHUGEINT "
            f"THEN ({e}::HUGEINT - 18446744073709551616::HUGEINT)::BIGINT "
            f"ELSE {e}::BIGINT END)")


def _us(e: str) -> str:
    """UHUGEINT in [0, 2^64) from a signed BIGINT expr (bit pattern)."""
    return (f"((({e}::HUGEINT + 18446744073709551616::HUGEINT) % "
            f"18446744073709551616::HUGEINT)::UHUGEINT)")


def _ux(a: str, b: str) -> str:
    """64-bit xor of two UHUGEINT exprs via the signed view."""
    return _us(f"xor({_sg(a)}, {_sg(b)})")


def _mix64_steps(x: str) -> str:
    """Lateral-alias column chain computing splitmix64 of column ``x``;
    the final column is ``mx`` (hashing.mix64)."""
    steps = [
        ("h1", _ux(x, f"({x} // 1073741824::UHUGEINT)")),       # x >> 30
        ("h2", f"((h1 * {_M1}::UHUGEINT) % {_MOD})"),
        ("h3", _ux("h2", "(h2 // 134217728::UHUGEINT)")),       # >> 27
        ("h4", f"((h3 * {_M2}::UHUGEINT) % {_MOD})"),
        ("mx", _ux("h4", "(h4 // 2147483648::UHUGEINT)")),      # >> 31
    ]
    return ", ".join(f"{e} AS {c}" for c, e in steps)


def _pow_values(base: int, n: int) -> str:
    p, rows = 1, []
    for k in range(n):
        rows.append(f"({k}, {p}::UHUGEINT)")
        p = (p * int(base)) % _U64
    return ", ".join(rows)


def _token_hash_ctes(table: str = "documents") -> str:
    """CTE chain from ``table(doc_id, text)`` to
    ``th(doc_id, pos, hv)`` — hv = hashing.hash_string_array of the
    pos-th token (1-based) of the tokenized text, as UHUGEINT."""
    return f"""
d AS (SELECT doc_id, {_TOK} AS toks FROM {table}),
tok AS (SELECT doc_id, unnest(toks) AS t,
               unnest(range(1, len(toks) + 1)) AS pos FROM d),
powr(k, p) AS (VALUES {_pow_values(int(_R), _MAX_TOK_LEN)}),
chars AS (
  SELECT doc_id, pos, len(t) AS tl,
         unnest(range(1, len(t) + 1)) AS i, t
  FROM tok),
terms AS (
  SELECT doc_id, pos, tl,
         (ascii(substr(t, i, 1))::UHUGEINT * powr.p) % {_MOD} AS term
  FROM chars JOIN powr ON powr.k = chars.tl - chars.i),
sums AS (
  SELECT doc_id, pos, tl,
         sum(term::HUGEINT)::UHUGEINT % {_MOD} AS s
  FROM terms GROUP BY doc_id, pos, tl),
th AS (
  SELECT doc_id, pos, {_mix64_steps('sx')}, mx AS hv
  FROM (SELECT doc_id, pos, {_ux('s', 'tl::UHUGEINT')} AS sx FROM sums))"""


def mix64_of_id_cte(table: str = "documents",
                    id_col: str = "doc_id") -> str:
    """CTE ``h(doc_id, mx)``: mx = hashing.mix64 of the id column (ids
    are non-negative, so the uint64 bit pattern equals the value)."""
    return f"""
h AS (
  SELECT {id_col}, {_mix64_steps('sx')}
  FROM (SELECT {id_col}, {id_col}::UHUGEINT AS sx FROM {table}))"""


def hash_split_sql(val_pct: int = 10, test_pct: int = 10,
                   table: str = "documents") -> str:
    """pipelines.hash_split in SQL."""
    hi = 2**64 - 1
    val_cut = hi * val_pct // 100
    test_cut = hi * (val_pct + test_pct) // 100
    return f"""
WITH {mix64_of_id_cte(table)}
SELECT doc_id,
       CASE WHEN mx < {val_cut}::UHUGEINT THEN 'val'
            WHEN mx < {test_cut}::UHUGEINT THEN 'test'
            ELSE 'train' END AS split
FROM h"""


def hash_sample_sql(pct: int = 20, table: str = "documents") -> str:
    """pipelines.hash_sample in SQL (keeps every source column)."""
    cut = (2**64 - 1) * pct // 100
    return f"""
WITH {mix64_of_id_cte(table)}
SELECT t.* FROM {table} t JOIN h USING (doc_id)
WHERE h.mx < {cut}::UHUGEINT"""


def fingerprint_sql(table: str = "documents") -> str:
    """textstats.fingerprint in SQL: per-token poly hash, then the
    position-weighted combine (hashing.combine_sequences) — one BIGINT
    fingerprint per document (empty docs hash to 0)."""
    return f"""
WITH {_token_hash_ctes(table)},
powc(k, p) AS (VALUES {_pow_values(int(_C), _MAX_DOC_TOKS)}),
m AS (SELECT doc_id, count(*) AS m FROM th GROUP BY doc_id),
fsum AS (
  SELECT th.doc_id,
         sum(((th.hv * powc.p) % {_MOD})::HUGEINT)::UHUGEINT % {_MOD} AS s,
         any_value(m.m) AS m
  FROM th JOIN m USING (doc_id)
  JOIN powc ON powc.k = m.m - th.pos
  GROUP BY th.doc_id),
fp AS (
  SELECT doc_id, {_mix64_steps('sx')}
  FROM (SELECT doc_id, {_ux('s', 'm::UHUGEINT')} AS sx FROM fsum))
SELECT d2.doc_id, coalesce({_sg('fp.mx')}, 0)::BIGINT AS fingerprint
FROM {table} d2 LEFT JOIN fp ON fp.doc_id = d2.doc_id"""


def simhash_ctes(table: str = "documents") -> str:
    """CTE chain ending in ``shv(doc_id, s)``: s = the signed int64 view
    of hashing.simhash_from_tokens per document (empty docs -> 0)."""
    pows2 = ", ".join(f"({k}, {1 << k}::UHUGEINT)" for k in range(64))
    return f"""{_token_hash_ctes(table)},
m AS (SELECT doc_id, count(*) AS m FROM th GROUP BY doc_id),
powb(b, v) AS (VALUES {pows2}),
bits AS (SELECT doc_id, unnest(range(0, 64)) AS b, hv FROM th),
cnt AS (
  SELECT doc_id, bits.b,
         sum(((hv // powb.v) % 2::UHUGEINT)::BIGINT) AS c
  FROM bits JOIN powb ON powb.b = bits.b GROUP BY doc_id, bits.b),
maj AS (
  SELECT cnt.doc_id, cnt.b
  FROM cnt JOIN m USING (doc_id) WHERE 2 * cnt.c > m.m),
sh AS (
  SELECT maj.doc_id, sum(powb.v::HUGEINT)::UHUGEINT % {_MOD} AS s
  FROM maj JOIN powb ON powb.b = maj.b GROUP BY maj.doc_id),
shv AS (
  SELECT d2.doc_id, coalesce({_sg('sh.s')}, 0)::BIGINT AS s
  FROM {table} d2 LEFT JOIN sh ON sh.doc_id = d2.doc_id)"""


def simhash_sql(table: str = "documents") -> str:
    """Per-document 64-bit SimHash (signed int64 view)."""
    return f"WITH {simhash_ctes(table)} SELECT doc_id, s AS simhash FROM shv"


def simhash_pairs_sql(max_hamming: int = 3, table: str = "documents") -> str:
    """dedup.simhash_candidates in SQL: EXHAUSTIVE pairwise hamming over
    the SQL-computed simhashes.  The Ray pipeline's 4-band pigeonhole
    candidate generation is complete for hamming <= 3 (< hamming_bands),
    so its verified output equals this exhaustive truth (modulo the
    max_bucket guard, which never triggers on the test corpora)."""
    return f"""
WITH {simhash_ctes(table)}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.s, b.s))::BIGINT AS hamming
FROM shv a JOIN shv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}"""
