"""Round-4 jsvm additions (verdict item #4): regex literals and
try/catch/finally/throw — the two constructs most likely in wild
scripts beyond the reference's shipped set (goja runs full ES, so a
user's fancier script runs there; this closes the gap for these two).

Unit coverage for the lexer heuristic (regex vs division), JSRegExp
semantics (test/exec/lastIndex), regex-aware String methods
(replace/replaceAll/match/matchAll/split/search with $-templates and
function replacers), Error objects, and host-exception catching —
plus one synthetic scrape script using both features end-to-end
through the CLI.
"""

from __future__ import annotations

import json

import pytest

from flyscrape_spark.parse.jsvm import (
    JsCompileError,
    compile_module,
)


def run1(src: str, *args):
    m = compile_module(src)
    return m.interp.call(m.default, list(args))


# ------------------------------------------------------ lexer heuristic


def test_division_still_division():
    assert run1("export default function(a, b) { return a / b / 2; }",
                8, 2) == 2.0


def test_division_after_paren_and_index():
    assert run1(
        "export default function(a) { return (a + 2) / 2 + a[0] / 2; }"
        if False else
        "export default function(x) { const a = [4]; "
        "return (x + 2) / 2 + a[0] / 2; }", 4) == 5.0


def test_regex_after_operators_and_keywords():
    src = """
export default function(s) {
  const hits = [];
  if (/foo/.test(s)) { hits.push("if"); }
  const x = s.match(/bar/) ? "yes" : "no";
  hits.push(x);
  return hits.join(",") + "," + (true && /baz/.test(s));
}
"""
    assert run1(src, "foo bar baz") == "if,yes,true"


def test_regex_with_slash_in_class_and_escape():
    # '/' inside [...] and escaped \/ must not terminate the literal
    assert run1(r"""
export default function(s) { return /[/]a\/b/.test(s); }
""", "/a/b") is True


def test_unterminated_regex_is_compile_error():
    with pytest.raises(JsCompileError):
        compile_module("export default function() { return /abc; }")


def test_unsupported_flags_rejected():
    with pytest.raises(JsCompileError):
        compile_module("export default function() { return /a/u; }")


# --------------------------------------------------------- JSRegExp


def test_exec_groups_and_undefined_for_nonparticipating():
    out = run1("""
export default function(s) {
  const m = /(a)|(b)/.exec(s);
  return [m[0], m[1], m[2] === undefined];
}
""", "a")
    assert out == ["a", "a", True]


def test_exec_global_lastindex_loop():
    assert run1("""
export default function(s) {
  const re = /\\d+/g;
  let m, total = 0;
  while ((m = re.exec(s)) !== null) { total += Number(m[0]); }
  return total;
}
""", "a10 b20 c12") == 42


def test_exec_null_on_no_match():
    assert run1(
        "export default function(s) { return /z/.exec(s) === null; }",
        "abc") is True


def test_flags_i_m_s():
    assert run1(
        "export default function(s) { return /FOO/i.test(s); }",
        "foo") is True
    assert run1(
        "export default function(s) { return /^b/m.test(s); }",
        "a\nb") is True
    assert run1(
        "export default function(s) { return /a.b/s.test(s); }",
        "a\nb") is True


def test_regex_props():
    out = run1("""
export default function() {
  const re = /ab+/gi;
  return [re.source, re.flags, re.global];
}
""")
    assert out == ["ab+", "gi", True]


def test_new_regexp_constructor():
    assert run1("""
export default function(s) { return new RegExp("a(b+)", "i").exec(s)[1]; }
""", "xABBy") == "BB"


# --------------------------------------------- regex-aware String methods


def test_replace_regex_first_vs_global():
    assert run1(
        "export default function(s) { return s.replace(/o/, '0'); }",
        "foo") == "f0o"
    assert run1(
        "export default function(s) { return s.replace(/o/g, '0'); }",
        "foo") == "f00"


def test_replace_dollar_templates():
    assert run1(
        "export default function(s) "
        "{ return s.replace(/(\\d+)-(\\d+)/, '$2-$1'); }",
        "12-34") == "34-12"
    assert run1(
        "export default function(s) "
        "{ return s.replace(/b/, '[$&][$$]'); }",
        "abc") == "a[b][$]c"
    assert run1(
        "export default function(s) "
        "{ return s.replace(/v(?<maj>\\d+)/, 'V$<maj>'); }",
        "v7") == "V7"


def test_replace_function_replacer():
    assert run1("""
export default function(s) {
  return s.replace(/[aeiou]/g, (c) => c.toUpperCase());
}
""", "hello") == "hEllO"
    # replacer receives (match, groups..., offset, string)
    assert run1("""
export default function(s) {
  return s.replace(/(l+)/, (m, g1, off) => g1.length + "@" + off);
}
""", "hello") == "he2@2o"


def test_replace_all_regex_and_string_fn():
    assert run1(
        "export default function(s) { return s.replaceAll(/l/g, 'L'); }",
        "hello") == "heLLo"
    assert run1(
        "export default function(s) "
        "{ return s.replaceAll('l', (m) => m.toUpperCase()); }",
        "hello") == "heLLo"


def test_match_nonglobal_and_global():
    assert run1(
        "export default function(s) { const m = s.match(/(\\w+)@/); "
        "return m[1]; }", "bob@x") == "bob"
    assert run1(
        "export default function(s) { return s.match(/\\d+/g); }",
        "a1 b22") == ["1", "22"]
    assert run1(
        "export default function(s) { return s.match(/z/) === null; }",
        "ab") is True


def test_match_all_for_of():
    assert run1("""
export default function(s) {
  const out = [];
  for (const m of s.matchAll(/(\\w)=(\\d)/g)) { out.push(m[1] + m[2]); }
  return out.join(",");
}
""", "a=1 b=2") == "a1,b2"


def test_split_regex_with_captures():
    assert run1(
        "export default function(s) { return s.split(/\\s+/); }",
        "a  b\tc") == ["a", "b", "c"]
    # capture groups splice into the result (JS + Python agree)
    assert run1(
        "export default function(s) { return s.split(/(,)/); }",
        "a,b") == ["a", ",", "b"]


def test_search():
    assert run1(
        "export default function(s) { return s.search(/\\d/); }",
        "ab3") == 2
    assert run1(
        "export default function(s) { return s.search(/z/); }",
        "ab") == -1


# ----------------------------------------------------- try/catch/throw


def test_try_catch_finally_order():
    assert run1("""
export default function() {
  const log = [];
  try { log.push("t"); throw new Error("x"); }
  catch (e) { log.push("c:" + e.message); }
  finally { log.push("f"); }
  return log.join(",");
}
""") == "t,c:x,f"


def test_finally_without_catch_propagates():
    assert run1("""
export default function() {
  let cleaned = false;
  try {
    try { throw new Error("inner"); } finally { cleaned = true; }
  } catch (e) { return [cleaned, e.message]; }
}
""") == [True, "inner"]


def test_throw_non_error_value():
    assert run1("""
export default function() {
  try { throw { code: 42, why: "teapot" }; }
  catch (e) { return e.code + ":" + e.why; }
}
""") == "42:teapot"


def test_error_constructors_and_tostring():
    assert run1("""
export default function() {
  const e = new TypeError("bad");
  return [e.name, e.message, String(e)];
}
""") == ["TypeError", "bad", "TypeError: bad"]


def test_catch_without_binding():
    assert run1("""
export default function() {
  try { throw new Error("x"); } catch { return "ok"; }
}
""") == "ok"


def test_host_exception_caught_as_error_shape():
    assert run1("""
export default function(x) {
  try { return x.missing.deeper; }
  catch (e) { return "caught:" + e.name; }
}
""", None) == "caught:Error"


def test_return_through_finally():
    assert run1("""
export default function() {
  let log = [];
  function f() {
    try { return "r"; } finally { log.push("f"); }
  }
  const v = f();
  return v + ":" + log.join("");
}
""") == "r:f"


def test_control_flow_not_caught():
    # break/continue/return must pass through catch untouched
    assert run1("""
export default function() {
  let n = 0;
  for (const x of [1, 2, 3]) {
    try { if (x === 2) { continue; } n += x; }
    catch (e) { n += 100; }
  }
  return n;
}
""") == 4


def test_try_requires_catch_or_finally():
    with pytest.raises(JsCompileError):
        compile_module("export default function() { try { } }")


def test_rethrow_from_catch():
    assert run1("""
export default function() {
  try {
    try { throw new Error("orig"); }
    catch (e) { throw new Error("wrapped:" + e.message); }
  } catch (e2) { return e2.message; }
}
""") == "wrapped:orig"


# --------------------------------------- end-to-end: CLI scrape script


SCRIPT = """
export const config = {
  urls: ["https://shop.test/"],
};

export default function ({ doc, url }) {
  const items = doc.find(".price").map((el) => {
    const raw = el.text();
    let price = null;
    try {
      const m = raw.match(/([0-9][0-9,]*\\.?[0-9]*)/);
      if (m === null) { throw new Error("no price in: " + raw); }
      price = Number(m[1].replace(/,/g, ""));
    } catch (e) {
      price = "ERR:" + e.message;
    }
    return price;
  });
  return { url, items };
}
"""


def test_synthetic_regex_try_script_through_cli(spark, tmp_path):
    from flyscrape_spark.cli import _run_once

    script = tmp_path / "prices.js"
    script.write_text(SCRIPT)
    pages_path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        [("https://shop.test/", "shop.test", 200,
          '<div class="price">$ 1,299.50</div>'
          '<div class="price">USD 7</div>'
          '<div class="price">call us</div>')],
        "url string, host string, status int, html string",
    ).write.mode("overwrite").parquet(pages_path)
    out_file = tmp_path / "out.json"
    _run_once(str(script), {"output.file": str(out_file)},
              spark=spark, pages_path=pages_path)
    rows = json.loads(out_file.read_text())
    assert rows[0]["data"]["items"] == [
        1299.5, 7, "ERR:no price in: call us"]
