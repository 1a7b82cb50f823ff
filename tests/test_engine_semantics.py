"""Cross-engine (Spark vs DuckDB) builtin-semantics divergence matrix.

Three divergence classes were found REACTIVELY across rounds 4-6 — DuckDB
HUGEINT render, double→DECIMAL quantization, ``levenshtein`` counting
codepoints (Spark) vs bytes (DuckDB).  This matrix makes the class
PROACTIVE: every builtin family the registry's oracle pairs rely on is
probed on adversarial literals in BOTH engines, in one test, forever.

Two kinds of row:

- ``agree``: the engines must produce identical values (repr-level, the
  same comparison the driver uses).  These are the functions an oracle
  pair may use freely on arbitrary data.  A failure here means an engine
  upgrade changed semantics under us — fix the affected oracles.
- ``diverge``: the engines are KNOWN to disagree; the row asserts the
  divergence still exists so the registry guard it forced stays
  necessary (if an upgrade aligns them, the row fails and the guard can
  be relaxed).  Each row names its guard.

Divergence classes pinned here (product semantics are Spark's; DuckDB is
only the test oracle):

1. ``levenshtein``: Spark codepoints, DuckDB bytes → registry restricts
   to single-byte text (`queries/datapipe.py` dedup_edit_distance).
2. ``substring(s, 0, n)``: Spark treats start 0 as 1; DuckDB counts a
   phantom position 0 → never pass a computed start that can be 0.
3. Case mapping: Spark (Java) ``upper('ß')='SS'``, ``lower('İ')='i̇'``;
   DuckDB (ICU-ish) gives 'ẞ' / 'i' → lower()/upper() oracle pairs are
   exact only off the locale-special set {ß, İ, dotless-ı, final sigma}.
4. ``trim``: DuckDB strips unicode whitespace (NBSP...), Spark only
   ASCII space → trim parity requires pre-normalizing \\s via regexp.
5. ``split``: Spark's delimiter is a REGEX, DuckDB string_split is
   literal → only meta-free delimiters (the registry uses ' ').
6. String literals: Spark SQL interprets backslash escapes ('\\t' is a
   tab), DuckDB is ANSI (literal backslash-t) → oracle SQL must never
   rely on backslash escapes inside plain quotes.
7. ``concat`` with NULL: Spark → NULL, DuckDB skips → use concat_ws or
   coalesce in oracle pairs.
8. ``CAST(double AS INT)``: Spark truncates toward zero, DuckDB ROUNDS
   → only cast doubles that are already integral (floor/ceil first).
9. double→STRING render: Spark '1.0E22' vs DuckDB '1e+22' → never put a
   raw double-cast string in oracle output position.
10. Transcendentals (ln/exp/pow) drift in the last ulp between libm
    builds → FLOOR-tick ladders for any cross-row-summed term (the
    bit-exactness rule; ln(3.0) differs today).
11. ``floor``/``ceil`` TYPE: Spark returns BIGINT, DuckDB DOUBLE → cast
    in oracle output position (the type-parity test enforces).
12. Default ORDER BY null placement: Spark ASC = NULLS FIRST, DuckDB
    ASC = NULLS LAST (mirrored for DESC) → any window/sort over a
    nullable key must filter NULLs or pin placement explicitly (found
    by the adversarial fixture in a_group_quantiles / a_mode, round 7).
"""

from __future__ import annotations

import datetime
import decimal

import duckdb
import pytest

# ---------------------------------------------------------------------------
# (id, spark_sql_expr, duckdb_sql_expr, kind)
# kind: "agree" = values must match; "diverge" = must NOT match (guard doc)
# ---------------------------------------------------------------------------
NBSP = " "
LSEP = " "

CASES = [
    # --- string length / indexing on multi-byte text ---
    ("length_multibyte", "length('héllo\U0001F600')", "length('héllo\U0001F600')", "agree"),
    ("length_combining", "length('é')", "length('é')", "agree"),
    ("substring_multibyte", "substring('héllo\U0001F600', 2, 3)", "substring('héllo\U0001F600', 2, 3)", "agree"),
    ("substring_negative_start", "substring('hello', -3, 2)", "substring('hello', -3, 2)", "agree"),
    ("substring_zero_start", "substring('hello', 0, 3)", "substring('hello', 0, 3)", "diverge"),
    ("instr_multibyte", "instr('héllo', 'llo')", "instr('héllo', 'llo')", "agree"),
    ("lpad_multibyte", "lpad('é', 3, '*')", "lpad('é', 3, '*')", "agree"),
    # --- case mapping ---
    ("lower_ascii", "lower('AbC-12')", "lower('AbC-12')", "agree"),
    ("upper_ascii", "upper('aBc-12')", "upper('aBc-12')", "agree"),
    ("lower_accented", "lower('ÉÀÜ')", "lower('ÉÀÜ')", "agree"),
    ("upper_sharp_s", "upper('straße')", "upper('straße')", "diverge"),
    ("lower_dotted_capital_i", "lower('İ')", "lower('İ')", "diverge"),
    # --- trim ---
    ("trim_ascii_space", "trim('  x  ')", "trim('  x  ')", "agree"),
    ("trim_nbsp", "trim(concat(char(160), 'x', char(160)))", "trim(chr(160) || 'x' || chr(160))", "diverge"),
    # --- split ---
    ("split_trailing_empties", "split('a,b,,', ',')", "string_split('a,b,,', ',')", "agree"),
    ("split_single_space", "split('a b  c', ' ')", "string_split('a b  c', ' ')", "agree"),
    ("split_regex_metachar", "split('a.b.c', '.')", "string_split('a.b.c', '.')", "diverge"),
    # --- string literal escape semantics (oracle authoring) ---
    ("literal_backslash_t", r"'a\tb'", r"'a\tb'", "diverge"),
    # --- regexp family: the registry's exact patterns on adversarial text ---
    ("regexp_ws_normalize",
     "regexp_replace('a  b　c' || char(9) || 'd', '\\\\s+', ' ')",
     "regexp_replace('a  b　c' || chr(9) || 'd', concat(chr(92), 's+'), ' ', 'g')",
     "agree"),
    ("regexp_count_bpe",
     "regexp_count('ab12!c d\U0001F600é', '[a-z]+|[0-9]+|[^a-z0-9 ]')",
     "length(regexp_replace('ab12!c d\U0001F600é', '[a-z]+|[0-9]+|[^a-z0-9 ]', 'xy', 'g')) - length(regexp_replace('ab12!c d\U0001F600é', '[a-z]+|[0-9]+|[^a-z0-9 ]', 'x', 'g'))",
     "agree"),
    ("regexp_email",
     "regexp_count('x a.b@c.de y z@q.io', '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\\\.[a-zA-Z]{2,}')",
     "length(regexp_replace('x a.b@c.de y z@q.io', '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+' || chr(92) || '.[a-zA-Z]{2,}', 'xy', 'g')) - length(regexp_replace('x a.b@c.de y z@q.io', '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+' || chr(92) || '.[a-zA-Z]{2,}', 'x', 'g'))",
     "agree"),
    ("regexp_ascii_guard", "'héllo' rlike '^[a-zA-Z0-9 ,.!?-]*$'", "regexp_matches('héllo', '^[a-zA-Z0-9 ,.!?-]*$')", "agree"),
    ("regexp_lazy", "regexp_extract('<a><b>', '<(.+?)>', 1)", "regexp_extract('<a><b>', '<(.+?)>', 1)", "agree"),
    ("regexp_alternation_order", "regexp_extract('abc', '(ab|abc)', 1)", "regexp_extract('abc', '(ab|abc)', 1)", "agree"),
    ("regexp_no_match", "regexp_extract('abc', '([0-9]+)', 1)", "regexp_extract('abc', '([0-9]+)', 1)", "agree"),
    ("regexp_case_flag",
     "regexp_count('aAbB', '(?i)a')",
     "length(regexp_replace('aAbB', '(?i)a', 'xy', 'g')) - length(regexp_replace('aAbB', '(?i)a', 'x', 'g'))",
     "agree"),
    # --- levenshtein units ---
    ("levenshtein_ascii", "levenshtein('kitten', 'sitting')", "levenshtein('kitten', 'sitting')", "agree"),
    ("levenshtein_multibyte", "levenshtein('café', 'cafe')", "levenshtein('café', 'cafe')", "diverge"),
    # --- hashing (oracle pairs depend on byte-identical digests) ---
    ("md5_multibyte", "md5('héllo\U0001F600')", "md5('héllo\U0001F600')", "agree"),
    ("sha2_256", "sha2('héllo', 256)", "sha256('héllo')", "agree"),
    # --- rounding ties (doubles and decimals) ---
    ("round_double_half_even_25", "round(CAST(2.5 AS DOUBLE))", "round(CAST(2.5 AS DOUBLE))", "agree"),
    ("round_double_half_even_35", "round(CAST(3.5 AS DOUBLE))", "round(CAST(3.5 AS DOUBLE))", "agree"),
    ("round_double_neg", "round(CAST(-2.5 AS DOUBLE))", "round(CAST(-2.5 AS DOUBLE))", "agree"),
    ("round_double_2dp", "round(CAST(2.675 AS DOUBLE), 2)", "round(CAST(2.675 AS DOUBLE), 2)", "agree"),
    ("round_decimal_tie", "round(CAST(2.5 AS DECIMAL(3,1)))", "round(CAST(2.5 AS DECIMAL(3,1)))", "agree"),
    ("round_decimal_neg_tie", "round(CAST(-0.05 AS DECIMAL(4,2)), 1)", "round(CAST(-0.05 AS DECIMAL(4,2)), 1)", "agree"),
    # --- integer division / modulo on negatives ---
    ("mod_negative_dividend", "-7 % 3", "-7 % 3", "agree"),
    ("pmod_vs_shifted_mod", "pmod(-7, 3)", "((-7 % 3) + 3) % 3", "agree"),
    ("integer_div_negative", "-7 DIV 2", "-7 // 2", "agree"),
    # --- casts ---
    ("cast_double_to_int", "CAST(CAST(2.7 AS DOUBLE) AS INT)", "CAST(CAST(2.7 AS DOUBLE) AS INT)", "diverge"),
    ("cast_integral_double_to_int", "CAST(floor(CAST(2.7 AS DOUBLE)) AS INT)", "CAST(floor(CAST(2.7 AS DOUBLE)) AS INT)", "agree"),
    ("cast_big_double_to_string", "CAST(CAST(1e22 AS DOUBLE) AS STRING)", "CAST(CAST(1e22 AS DOUBLE) AS VARCHAR)", "diverge"),
    ("cast_small_double_to_string", "CAST(CAST(0.1 AS DOUBLE) AS STRING)", "CAST(CAST(0.1 AS DOUBLE) AS VARCHAR)", "agree"),
    ("cast_ws_string_to_int", "TRY_CAST(' 12 ' AS INT)", "TRY_CAST(' 12 ' AS INT)", "agree"),
    ("cast_frac_string_to_int", "TRY_CAST('12.9' AS INT)", "TRY_CAST('12.9' AS INT)", "diverge"),
    # --- date / time ---
    ("date_trunc_week_origin", "CAST(date_trunc('week', DATE '2026-01-01') AS DATE)", "CAST(date_trunc('week', DATE '2026-01-01') AS DATE)", "agree"),
    ("date_trunc_week_on_sunday", "CAST(date_trunc('week', DATE '2026-08-16') AS DATE)", "CAST(date_trunc('week', DATE '2026-08-16') AS DATE)", "agree"),
    ("date_trunc_quarter", "CAST(date_trunc('quarter', DATE '2026-08-16') AS DATE)", "CAST(date_trunc('quarter', DATE '2026-08-16') AS DATE)", "agree"),
    ("dayofweek_mapping", "dayofweek(DATE '2026-08-16') - 1", "dayofweek(DATE '2026-08-16')", "agree"),
    ("weekofyear_iso", "weekofyear(DATE '2026-01-01')", "CAST(strftime(DATE '2026-01-01', '%V') AS INT)", "agree"),
    ("date_format_vs_strftime", "date_format(DATE '2026-08-09', 'yyyy-MM-dd')", "strftime(DATE '2026-08-09', '%Y-%m-%d')", "agree"),
    ("unix_micros_epoch", "unix_micros(TIMESTAMP '2026-01-01 00:00:00.123456')", "epoch_us(TIMESTAMP '2026-01-01 00:00:00.123456')", "agree"),
    ("to_date_lenient_digits", "to_date('2026-2-3')", "TRY_CAST('2026-2-3' AS DATE)", "agree"),
    # --- NULL-handling families ---
    ("greatest_skips_null", "greatest(1, NULL, 3)", "greatest(1, NULL, 3)", "agree"),
    ("least_skips_null", "least(1, NULL, 3)", "least(1, NULL, 3)", "agree"),
    ("concat_null_propagation", "concat('a', CAST(NULL AS STRING), 'b')", "concat('a', CAST(NULL AS VARCHAR), 'b')", "diverge"),
    ("concat_ws_skips_null", "concat_ws(',', 'a', CAST(NULL AS STRING), 'b')", "concat_ws(',', 'a', CAST(NULL AS VARCHAR), 'b')", "agree"),
    ("array_join_skips_null", "array_join(array('a', NULL, 'b'), ',')", "array_to_string(['a', NULL, 'b'], ',')", "agree"),
    # --- arrays / collation ---
    ("array_sort_nulls_last", "array_sort(array(3, NULL, 1))", "list_sort([3, NULL, 1])", "agree"),
    ("array_sort_utf8_binary", "array_sort(array('b','a','ä','Z','\U0001F600','ss','ß'))", "list_sort(['b','a','ä','Z','\U0001F600','ss','ß'])", "agree"),
    ("string_compare_utf8_binary", "'ä' > 'z'", "'ä' > 'z'", "agree"),
    ("sequence_with_step", "sequence(1, 7, 3)", "generate_series(1, 7, 3)", "agree"),
    ("element_at_one_based", "element_at(array(10,20,30), 2)", "list_extract([10,20,30], 2)", "agree"),
    ("conv_base16", "conv('ff', 16, 10)", "CAST(CAST('0xff' AS INTEGER) AS VARCHAR)", "agree"),
    # --- ORDER BY null placement ---
    ("order_by_null_default",
     "(SELECT v FROM VALUES (1),(NULL),(2) AS t(v) ORDER BY v LIMIT 1)",
     "(SELECT v FROM (VALUES (1),(NULL),(2)) t(v) ORDER BY v LIMIT 1)",
     "diverge"),
    ("order_by_nulls_last_explicit",
     "(SELECT v FROM VALUES (1),(NULL),(2) AS t(v) ORDER BY v ASC NULLS LAST LIMIT 1)",
     "(SELECT v FROM (VALUES (1),(NULL),(2)) t(v) ORDER BY v ASC NULLS LAST LIMIT 1)",
     "agree"),
    # --- float math renders (bit-exactness ground rules) ---
    ("sqrt_render", "CAST(sqrt(2.0) AS STRING)", "CAST(sqrt(2.0) AS VARCHAR)", "agree"),
    ("ln_last_ulp", "CAST(ln(3.0) AS STRING)", "CAST(ln(3.0) AS VARCHAR)", "diverge"),
    # --- type renders (floor returns BIGINT in Spark, DOUBLE in DuckDB) ---
    ("floor_result_type", "typeof(floor(CAST(-2.5 AS DOUBLE)))", "lower(typeof(floor(CAST(-2.5 AS DOUBLE))))", "diverge"),
    # --- bit machinery for the HLL/packed-key family (round 7) ---
    ("bin_basic", "bin(5)", "bin(5)", "agree"),
    ("bin_zero", "bin(0)", "bin(0)", "agree"),
    ("bin_length_22bit", "length(bin(4194303))", "length(bin(4194303))", "agree"),
    ("shiftright_by_col",
     "(SELECT shiftright(8388608, x) FROM VALUES (3) AS t(x))",
     "(SELECT 8388608 >> x FROM (VALUES (3)) t(x))",
     "agree"),
    ("shiftleft_pack", "shiftleft(CAST(7 AS BIGINT), 32) + 9", "(CAST(7 AS BIGINT) << 32) + 9", "agree"),
    ("mod_pow2", "CAST(4290000000 AS BIGINT) % 4194304", "CAST(4290000000 AS BIGINT) % 4194304", "agree"),
    # --- timestamp micro arithmetic (j_asof_nearest) ---
    ("timestampdiff_micros",
     "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'2000-01-01 00:00:00.000001', TIMESTAMP_NTZ'2000-01-01 00:00:01.5')",
     "epoch_us(TIMESTAMP '2000-01-01 00:00:01.5') - epoch_us(TIMESTAMP '2000-01-01 00:00:00.000001')",
     "agree"),
    # --- GROUPING bit order (a_rollup/a_cube/a_grouping_sets gid) ---
    ("grouping_id_bit_order",
     "(SELECT MIN(g) FROM (SELECT CAST(grouping_id() AS INT) AS g FROM VALUES ('a','x') AS t(s, p) GROUP BY GROUPING SETS ((s), (p))) q)",
     "(SELECT MIN(g) FROM (SELECT GROUPING(s, p)::INTEGER AS g FROM (VALUES ('a','x')) t(s, p) GROUP BY GROUPING SETS ((s), (p))) q)",
     "agree"),
]


def _norm(v):
    """Engine-neutral value image: same discipline as the driver compare
    (floats by repr — bit-exact; Decimal/date/datetime tagged by type)."""
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, list):
        return ("arr", tuple(_norm(x) for x in v))
    if isinstance(v, bytes):
        return ("b", v.hex())
    return (type(v).__name__, v)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.parametrize(
    "cid,spark_expr,duck_expr,kind",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_engine_semantics(spark, duck, cid, spark_expr, duck_expr, kind):
    sv = spark.sql(f"SELECT {spark_expr} AS v").collect()[0][0]
    dv = duck.execute(f"SELECT {duck_expr} AS v").fetchone()[0]
    if kind == "agree":
        assert _norm(sv) == _norm(dv), (
            f"{cid}: engines disagree — spark={sv!r} duck={dv!r}; an oracle "
            "pair relying on this function family is now unsound"
        )
    else:
        assert _norm(sv) != _norm(dv), (
            f"{cid}: engines now AGREE ({sv!r}) — the registry guard for "
            "this divergence class can be relaxed (see module docstring)"
        )


def test_case_count_is_broad():
    """The matrix must keep covering every family the registry oracles
    use; shrinking it silently would un-pin a divergence class."""
    assert len(CASES) >= 60
    assert sum(1 for c in CASES if c[3] == "diverge") >= 12
