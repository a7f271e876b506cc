"""XXH64 transliterated to pure ANSI-ish DuckDB SQL.

Closes the last rows-only correctness exception (``tf_xxhash``): DuckDB
has no Spark-compatible xxhash64 builtin, so the oracle re-derives it
from the spec — the same spec ``transforms.builtin.xxhash64_py``
implements (and which is hypothesis-tested bit-identical to Spark's JVM
builtin at seed 42). Construction:

- UTF-8 bytes via ``hex(encode(text))`` parsed to a byte list once;
- all 64-bit wrapping arithmetic in UHUGEINT with an explicit
  ``% 2^64`` (DuckDB raises on native UBIGINT overflow);
- rotl = wrapping-shl | logical-shr; xor/shr are native;
- the 32-byte stripe loop as a RECURSIVE CTE keyed per (doc, seed),
  re-joining the byte list each step (state rows stay narrow);
- the ≤31-byte tail unrolled as a fixed CTE chain (3×8B, 1×4B, 3×1B
  conditional steps) + the avalanche.

Validated bit-exact against the Python twin over the full test corpus
for seeds 42 and 7 (tests/test_transforms.py::test_xxhash_sql_oracle).

Reference parity: hash_with_args
(/root/reference/transformers/hash_with_args/fastapi_server.py:56-86 —
seeded xxhash64 content digests); this module exists so that leg is
value-checked by the driver gate instead of rows-only.
"""

from __future__ import annotations

_M64 = "18446744073709551616"  # 2^64, as a UHUGEINT-ranged literal
_P1 = "11400714785074694791"   # 0x9E3779B185EBCA87
_P2 = "14029467366897019727"   # 0xC2B2AE3D27D4EB4F
_P3 = "1609587929392839161"    # 0x165667B19E3779F9
_P4 = "9650029242287828579"    # 0x85EBCA77C2B2AE63
_P5 = "2870177450012600261"    # 0x27D4EB2F165667C5


def _u(x: str) -> str:
    return f"CAST({x} AS UHUGEINT)"


def _mul64(a: str, b: str) -> str:
    return f"CAST(({_u(a)} * {_u(b)}) % {_M64} AS UBIGINT)"


def _add64(a: str, b: str) -> str:
    return f"CAST(({_u(a)} + {_u(b)}) % {_M64} AS UBIGINT)"


def _rotl(x: str, r: int) -> str:
    return (
        f"(CAST(({_u(x)} * {1 << r}) % {_M64} AS UBIGINT) | "
        f"(({x}) >> {64 - r}))"
    )


def _round(acc: str, lane: str) -> str:
    return _mul64(_rotl(_add64(acc, _mul64(lane, _P2)), 31), _P1)


def _lane(byt: str, off: str, width: int) -> str:
    """``width``-byte little-endian read from 1-based offset expr."""
    terms = " + ".join(
        f"CAST({byt}[{off}+{j}] AS UBIGINT) * {1 << (8 * j)}"
        for j in range(width)
    )
    return f"({terms})"


def xxh64_cte(source_sql: str, seeds: tuple[int, ...]) -> str:
    """CTE chain (use after ``WITH RECURSIVE``) computing XXH64 of the
    UTF-8 bytes of ``text`` for every row of ``source_sql`` (must
    yield doc_id, text) and every seed. Final CTE ``xxfinal``:
    (doc_id, seed, h UBIGINT)."""
    seed_rows = ", ".join(f"({s})" for s in seeds)
    merge_h = _add64(
        _add64(_rotl("v1", 1), _rotl("v2", 7)),
        _add64(_rotl("v3", 12), _rotl("v4", 18)),
    )
    zero = "CAST(0 AS UBIGINT)"
    merge_steps = [
        _add64(_mul64(f"xor(h, {_round(zero, v)})", _P1), _P4)
        for v in ("v1", "v2", "v3", "v4")
    ]

    def tail8(h: str, i: str) -> str:
        k = _round(zero, _lane("bytes", f"{i}+1", 8))
        return _add64(_mul64(_rotl(f"xor({h}, {k})", 27), _P1), _P4)

    def tail4(h: str, i: str) -> str:
        x = _mul64(_lane("bytes", f"{i}+1", 4), _P1)
        return _add64(_mul64(_rotl(f"xor({h}, {x})", 23), _P2), _P3)

    def tail1(h: str, i: str) -> str:
        x = _mul64(f"CAST(bytes[{i}+1] AS UBIGINT)", _P5)
        return _mul64(_rotl(f"xor({h}, {x})", 11), _P1)

    def step(n_needed: int, adv: int, fn) -> str:
        return (
            f"SELECT doc_id, seed, n, bytes,\n"
            f"  CASE WHEN n - i >= {n_needed} THEN {fn('h', 'i')} ELSE h END AS h,\n"
            f"  CASE WHEN n - i >= {n_needed} THEN i + {adv} ELSE i END AS i"
        )

    return f"""
xxsrc AS ({source_sql}),
xxb AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM xxsrc
),
xxbytes AS (
  SELECT doc_id, n,
    list_transform(generate_series(1, n),
      i -> CAST(16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
           + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1 AS UBIGINT)) AS bytes
  FROM xxb
),
xxseeds AS (SELECT CAST(s AS UBIGINT) AS seed FROM (VALUES {seed_rows}) t(s)),
xxstripe AS (
  SELECT b.doc_id, s.seed, CAST(0 AS BIGINT) AS i,
    {_add64(_add64("s.seed", _P1), _P2)} AS v1,
    {_add64("s.seed", _P2)} AS v2,
    s.seed AS v3,
    CAST(({_u("s.seed")} + {_M64} - {_u(_P1)}) % {_M64} AS UBIGINT) AS v4
  FROM xxb b CROSS JOIN xxseeds s WHERE b.n >= 32
  UNION ALL
  SELECT st.doc_id, st.seed, st.i + 32,
    {_round("st.v1", _lane("b.bytes", "st.i+1", 8))},
    {_round("st.v2", _lane("b.bytes", "st.i+9", 8))},
    {_round("st.v3", _lane("b.bytes", "st.i+17", 8))},
    {_round("st.v4", _lane("b.bytes", "st.i+25", 8))}
  FROM xxstripe st JOIN xxbytes b USING (doc_id)
  WHERE st.i + 32 <= b.n
),
xxmerged AS (
  SELECT doc_id, seed, i, {merge_h} AS h, v1, v2, v3, v4
  FROM (SELECT st.* FROM xxstripe st JOIN xxb b USING (doc_id)
        WHERE st.i + 32 > b.n)
),
xxm1 AS (SELECT doc_id, seed, i, {merge_steps[0]} AS h, v2, v3, v4 FROM xxmerged),
xxm2 AS (SELECT doc_id, seed, i, {merge_steps[1]} AS h, v3, v4 FROM xxm1),
xxm3 AS (SELECT doc_id, seed, i, {merge_steps[2]} AS h, v4 FROM xxm2),
xxm4 AS (SELECT doc_id, seed, i, {merge_steps[3]} AS h FROM xxm3),
xxinit AS (
  SELECT doc_id, seed, i, h FROM xxm4
  UNION ALL
  SELECT b.doc_id, s.seed, CAST(0 AS BIGINT) AS i, {_add64("s.seed", _P5)} AS h
  FROM xxb b CROSS JOIN xxseeds s WHERE b.n < 32
),
xxlen AS (
  SELECT x.doc_id, x.seed, x.i, {_add64("x.h", "CAST(bb.n AS UBIGINT)")} AS h,
         bb.n, bb.bytes
  FROM xxinit x JOIN xxbytes bb ON bb.doc_id = x.doc_id
),
xxt1 AS ({step(8, 8, tail8)} FROM xxlen),
xxt2 AS ({step(8, 8, tail8)} FROM xxt1),
xxt3 AS ({step(8, 8, tail8)} FROM xxt2),
xxt4 AS ({step(4, 4, tail4)} FROM xxt3),
xxu1 AS ({step(1, 1, tail1)} FROM xxt4),
xxu2 AS ({step(1, 1, tail1)} FROM xxu1),
xxu3 AS ({step(1, 1, tail1)} FROM xxu2),
xxa1 AS (SELECT doc_id, seed, xor(h, h >> 33) AS h FROM xxu3),
xxa2 AS (SELECT doc_id, seed, {_mul64("h", _P2)} AS h FROM xxa1),
xxa3 AS (SELECT doc_id, seed, xor(h, h >> 29) AS h FROM xxa2),
xxa4 AS (SELECT doc_id, seed, {_mul64("h", _P3)} AS h FROM xxa3),
xxfinal AS (SELECT doc_id, seed, xor(h, h >> 32) AS h FROM xxa4)
"""


def xxhash_oracle_sql(table: str = "documents") -> str:
    """The complete ``tf_xxhash`` oracle: per-doc XXH64 hex digests at
    seeds 42 and 7 over ``table(doc_id, text)``. ``jvm_py_equal`` is
    TRUE by construction here; the Spark side computes it for real
    (pure-Python twin vs JVM builtin, per row)."""
    return (
        "WITH RECURSIVE "
        + xxh64_cte(f"SELECT doc_id, text FROM {table}", (42, 7))
        + """
SELECT doc_id,
  max(CASE WHEN seed = 42 THEN lpad(lower(hex(h)), 16, '0') END) AS xxh,
  max(CASE WHEN seed = 7 THEN lpad(lower(hex(h)), 16, '0') END) AS xxh_seed7,
  TRUE AS jvm_py_equal
FROM xxfinal GROUP BY doc_id"""
    )
