"""XXH64 (xxHash, Yann Collet's public algorithm) as generated DuckDB
SQL — the oracle-side twin of Spark's ``xxhash64`` expression.

Why this exists: the engine's default MinHash/SimHash hash family is
Spark-native ``xxhash64`` (JVM-side, the 100-TB path). DuckDB has no
xxhash64, so those queries were rows-only checks with md5-family oracle
twins. This module reproduces Spark's exact bit stream in pure SQL —
unsigned 64-bit arithmetic emulated on HUGEINT (multiplies split into
32-bit limbs so nothing overflows INT128, rotates as shift+carry, xor
via signed BIGINT round-trips) — which upgrades the last rows-only
queries to full value-hash oracles.

Shape: every primitive emits one tiny SQL step; steps become a chain of
CTEs where each value is a real COLUMN of the previous CTE (textual
alias inlining would blow up exponentially), and each CTE projects only
the columns still live downstream. Matches Spark bit-for-bit on the
empty string, all tail paths (<8/<32 bytes), exact 32, and multi-stripe
inputs, and on the (string, long) chained form — pinned in
tests/test_xxhsql.py against ``F.xxhash64`` ground truth.
"""

from __future__ import annotations

import re

U64 = 1 << 64
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
SPARK_SEED = 42


class Steps:
    """Ordered list of (name, sql) computation steps over a base query."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.steps: list[tuple[str, str]] = []
        self.n = 0

    def add(self, sql: str) -> str:
        name = f"{self.prefix}{self.n}"
        self.n += 1
        self.steps.append((name, sql))
        return name

    def ctes(self, base_name: str, base_cols: list[str], final: list[tuple[str, str]]):
        """Emit [(cte_name, cte_sql)] chaining one CTE per step over
        ``base_name``; each CTE projects only still-live columns.
        ``final`` is [(expr, alias)] for the terminal CTE. Returns
        (cte_list, final_cte_name)."""
        ident = re.compile(rf"\b{self.prefix}\d+\b")
        base_ident = [re.compile(rf"\b{re.escape(c)}\b") for c in base_cols]
        # liveness: a column is needed at step i if any later step or the
        # final select references it
        later_refs: list[set[str]] = [set() for _ in range(len(self.steps) + 1)]
        final_sql = " ".join(e for e, _ in final)
        refs_at = []
        for _, sql in self.steps:
            refs_at.append(set(ident.findall(sql)) | {c for c, p in zip(base_cols, base_ident) if p.search(sql)})
        refs_at.append(set(ident.findall(final_sql)) | {c for c, p in zip(base_cols, base_ident) if p.search(final_sql)})
        for i in range(len(self.steps) - 1, -1, -1):
            later_refs[i] = later_refs[i + 1] | refs_at[i + 1]
        out = []
        prev = base_name
        available = set(base_cols)
        for i, (name, sql) in enumerate(self.steps):
            live = sorted((later_refs[i] & available) - {name})
            available.add(name)
            cols = ", ".join(live + [f"{sql} AS {name}"])
            cte_name = f"{self.prefix}_{name}"
            out.append((cte_name, f"SELECT {cols} FROM {prev}"))
            prev = cte_name
        fin_cols = ", ".join(f"{e} AS {a}" for e, a in final)
        fin_name = f"{self.prefix}_fin"
        out.append((fin_name, f"SELECT {fin_cols} FROM {prev}"))
        return out, fin_name


def mult64(st: Steps, a: str, b) -> str:
    """a*b mod 2^64; operands are column names or int literals < 2^64."""
    return st.add(
        f"((({a} % 4294967296) * {b} + (((({a} // 4294967296) * {b}) % 4294967296)"
        f" * 4294967296)) % {U64})"
    )


def rotl(st: Steps, x: str, r: int) -> str:
    return st.add(f"((({x} * {1 << r}) % {U64}) + ({x} // {1 << (64 - r)}))")


def xor64(st: Steps, a: str, b: str) -> str:
    sa = st.add(f"(CASE WHEN {a} >= 9223372036854775808 THEN {a} - {U64} ELSE {a} END)::BIGINT")
    sb = st.add(f"(CASE WHEN {b} >= 9223372036854775808 THEN {b} - {U64} ELSE {b} END)::BIGINT")
    x = st.add(f"xor({sa}, {sb})")
    return st.add(f"(CASE WHEN {x} < 0 THEN {x}::HUGEINT + {U64} ELSE {x}::HUGEINT END)")


def _round(st: Steps, acc, lane: str) -> str:
    """XXH64 round: rotl(acc + lane*P2, 31) * P1."""
    m = mult64(st, lane, P2)
    a = st.add(f"(({acc} + {m}) % {U64})")
    r = rotl(st, a, 31)
    return mult64(st, r, P1)


def _byte(hx: str, i_expr: str) -> str:
    return f"(('0x' || substr({hx}, ({i_expr})*2+1, 2))::INT)::HUGEINT"


def _lane(st: Steps, hx: str, off_expr: str, nbytes: int) -> str:
    terms = " + ".join(
        f"{_byte(hx, f'({off_expr})+{b}')} * {1 << (8 * b)}" for b in range(nbytes)
    )
    return st.add(f"({terms})")


def xxh64_bytes(st: Steps, hx: str, blen: str, seed: str, max_len: int) -> str:
    """Steps for XXH64 over a byte string: ``hx`` = padded hex column,
    ``blen`` = byte-length column, ``seed`` unsigned sql expr; valid for
    lengths in [0, max_len]. Returns the unsigned hash column name."""
    max_stripes = max_len // 32
    n = st.add(f"({blen})")
    sd = st.add(f"(({seed}) % {U64})")
    if max_stripes > 0:
        vs = [
            st.add(f"(({sd} + {(P1 + P2) % U64}) % {U64})"),
            st.add(f"(({sd} + {P2}) % {U64})"),
            sd,
            st.add(f"(({sd} + {U64 - P1}) % {U64})"),
        ]
        for t in range(max_stripes):
            new_vs = []
            for i, v in enumerate(vs):
                lane = _lane(
                    st, hx, f"CASE WHEN {n} // 32 > {t} THEN {t * 32 + i * 8} ELSE 0 END", 8
                )
                rolled = _round(st, v, lane)
                new_vs.append(st.add(f"(CASE WHEN {n} // 32 > {t} THEN {rolled} ELSE {v} END)"))
            vs = new_vs
        parts = [rotl(st, vs[0], 1), rotl(st, vs[1], 7), rotl(st, vs[2], 12), rotl(st, vs[3], 18)]
        h = st.add(f"(({' + '.join(parts)}) % {U64})")
        for v in vs:
            k = _round(st, "0::HUGEINT", v)
            x = xor64(st, h, k)
            m = mult64(st, x, P1)
            h = st.add(f"(({m} + {P4}) % {U64})")
        h = st.add(f"(CASE WHEN {n} >= 32 THEN {h} ELSE ({sd} + {P5}) % {U64} END)")
    else:
        h = st.add(f"(({sd} + {P5}) % {U64})")
    h = st.add(f"(({h} + {n}) % {U64})")
    base = st.add(f"(CASE WHEN {n} >= 32 THEN ({n} // 32) * 32 ELSE 0 END)")
    for t in range(3):  # up to three tail 8-byte lanes (<=31 remaining)
        off = st.add(f"({base} + {8 * t})")
        cond = f"{off} + 8 <= {n}"
        lane = _lane(st, hx, f"CASE WHEN {cond} THEN {off} ELSE 0 END", 8)
        k1 = _round(st, "0::HUGEINT", lane)
        x = xor64(st, h, k1)
        r = rotl(st, x, 27)
        m = mult64(st, r, P1)
        cand = st.add(f"(({m} + {P4}) % {U64})")
        h = st.add(f"(CASE WHEN {cond} THEN {cand} ELSE {h} END)")
    p8 = st.add(
        f"({base} + CASE WHEN {n} - {base} >= 24 THEN 24"
        f" WHEN {n} - {base} >= 16 THEN 16 WHEN {n} - {base} >= 8 THEN 8 ELSE 0 END)"
    )
    cond4 = f"{p8} + 4 <= {n}"
    l4 = _lane(st, hx, f"CASE WHEN {cond4} THEN {p8} ELSE 0 END", 4)
    m4 = mult64(st, l4, P1)
    x4 = xor64(st, h, m4)
    r4 = rotl(st, x4, 23)
    mm4 = mult64(st, r4, P2)
    cand4 = st.add(f"(({mm4} + {P3}) % {U64})")
    h = st.add(f"(CASE WHEN {cond4} THEN {cand4} ELSE {h} END)")
    p4 = st.add(f"({p8} + CASE WHEN {p8} + 4 <= {n} THEN 4 ELSE 0 END)")
    for t in range(3):  # up to three trailing bytes
        off = st.add(f"({p4} + {t})")
        condb = f"{off} < {n}"
        b = st.add(f"(CASE WHEN {condb} THEN {_byte(hx, off)} ELSE 0::HUGEINT END)")
        mb = mult64(st, b, P5)
        xb = xor64(st, h, mb)
        rb = rotl(st, xb, 11)
        candb = mult64(st, rb, P1)
        h = st.add(f"(CASE WHEN {condb} THEN {candb} ELSE {h} END)")
    return _avalanche(st, h)


def _avalanche(st: Steps, h: str) -> str:
    x1 = xor64(st, h, st.add(f"({h} // {1 << 33})"))
    m1 = mult64(st, x1, P2)
    x2 = xor64(st, m1, st.add(f"({m1} // {1 << 29})"))
    m2 = mult64(st, x2, P3)
    return xor64(st, m2, st.add(f"({m2} // {1 << 32})"))


def xxh64_long(st: Steps, lval: str, seed: str) -> str:
    """Spark's hashLong(l, seed): the single-8-byte-lane path over the
    long's unsigned bit pattern (how a long argument chains onto the
    hash of the preceding argument in multi-arg ``xxhash64``)."""
    lu = st.add(
        f"(CASE WHEN ({lval}) < 0 THEN ({lval})::HUGEINT + {U64} ELSE ({lval})::HUGEINT END)"
    )
    h = st.add(f"((({seed}) + {P5} + 8) % {U64})")
    k1 = _round(st, "0::HUGEINT", lu)
    x = xor64(st, h, k1)
    r = rotl(st, x, 27)
    m = mult64(st, r, P1)
    h = st.add(f"(({m} + {P4}) % {U64})")
    return _avalanche(st, h)


def to_signed(expr: str) -> str:
    return f"(CASE WHEN {expr} >= 9223372036854775808 THEN {expr} - {U64} ELSE {expr} END)::BIGINT"


def hex_input(col: str, max_len: int) -> str:
    """Padded hex expression for a VARCHAR column (pad so gated-off
    lane reads on short strings still parse as zero bytes)."""
    return f"hex(encode({col})) || repeat('0', {2 * (max_len + 8)})"


def long_chain_ctes(
    prefix: str,
    base_sql: str,
    long_col: str,
    seed_col: str,
    carry_cols: list[str],
    out_col: str = "h",
):
    """CTE chain for Spark's multi-argument chaining step: given a row
    with a (signed BIGINT) hash ``seed_col`` of the preceding argument
    and a BIGINT ``long_col``, compute signed
    ``xxhash64(<preceding args>, long_col)`` = hashLong(long_col,
    seed=seed_col) — the form MinHash members use, where member j of a
    shingle is ``xxhash64(shingle, j)`` and the shingle's own hash is
    computed once per distinct shingle upstream. Returns
    (cte_list, final_cte_name); the final CTE has carry_cols + out_col."""
    st = Steps(prefix)
    seed_u = st.add(
        f"(CASE WHEN {seed_col} < 0 THEN {seed_col}::HUGEINT + {U64}"
        f" ELSE {seed_col}::HUGEINT END)"
    )
    h = xxh64_long(st, long_col, seed_u)
    final = [(c, c) for c in carry_cols] + [(to_signed(h), out_col)]
    return st.ctes(f"({base_sql})", carry_cols + [long_col, seed_col], final)


def string_hash_ctes(
    prefix: str,
    base_sql: str,
    string_col: str,
    carry_cols: list[str],
    max_len: int,
    out_col: str = "h",
    second_long: str | None = None,
):
    """CTE chain computing signed ``xxhash64(string_col[, second_long])``
    (Spark semantics, seed 42) for every row of ``base_sql``. Returns
    (cte_list, final_cte_name); the final CTE has carry_cols + out_col."""
    st = Steps(prefix)
    hx = st.add(hex_input(string_col, max_len))
    bl = st.add(f"octet_length(encode({string_col}))")
    h = xxh64_bytes(st, hx, bl, f"{SPARK_SEED}::HUGEINT", max_len)
    if second_long is not None:
        h = xxh64_long(st, second_long, h)
    final = [(c, c) for c in carry_cols] + [(to_signed(h), out_col)]
    return st.ctes(f"({base_sql})", carry_cols + [string_col] + ([second_long] if second_long else []), final)
