"""Round-4 session-2 jsvm additions batch 2: switch/case (with
fall-through and a default anywhere in the body), do-while, and
for...in enumeration — three constructs common in wild scrape
scripts that were compile errors before."""

from __future__ import annotations

import json

from flyscrape_spark.parse.jsvm import compile_module


def run1(src: str, *args):
    m = compile_module(src)
    return m.interp.call(m.default, list(args))


def test_switch_basic_and_default():
    src = """
export default function(x) {
  switch (x) {
    case 1: return "one";
    case 2:
    case 3: return "two-or-three";
    default: return "other";
  }
}
"""
    assert run1(src, 1) == "one"
    assert run1(src, 2) == "two-or-three"
    assert run1(src, 3) == "two-or-three"
    assert run1(src, 99) == "other"


def test_switch_fall_through_and_break():
    src = """
export default function(x) {
  const out = [];
  switch (x) {
    case 1: out.push("one");
    case 2: out.push("two"); break;
    case 3: out.push("three");
  }
  return out;
}
"""
    assert run1(src, 1) == ["one", "two"]
    assert run1(src, 2) == ["two"]
    assert run1(src, 3) == ["three"]
    assert run1(src, 4) == []


def test_switch_strict_equality():
    # 1 does not match "1" under === matching
    src = """
export default function(x) {
  switch (x) { case "1": return "str"; case 1: return "num"; }
  return "none";
}
"""
    assert run1(src, 1) == "num"
    assert run1(src, "1") == "str"


def test_switch_default_position_falls_through():
    src = """
export default function(x) {
  const out = [];
  switch (x) { default: out.push("d"); case 9: out.push("nine"); }
  return out;
}
"""
    assert run1(src, 0) == ["d", "nine"]
    assert run1(src, 9) == ["nine"]


def test_do_while_runs_body_first():
    assert run1(
        "export default function(){ let i = 10; "
        "do { i++; } while (i < 5); return i; }"
    ) == 11
    assert run1(
        "export default function(){ let i = 0; "
        "do i += 2; while (i < 5); return i; }"
    ) == 6


def test_do_while_break_continue():
    src = """
export default function() {
  let i = 0; const out = [];
  do { i++; if (i === 2) continue; if (i === 4) break; out.push(i); }
  while (i < 10);
  return out;
}
"""
    assert run1(src) == [1, 3]


def test_for_in_objects_arrays_null():
    src = """
export default function(o, a) {
  const ks = [];
  for (const k in o) ks.push(k);
  for (const i in a) ks.push(i);
  for (const n in null) ks.push("never");
  return ks;
}
"""
    assert run1(src, {"x": 1, "y": 2}, [7, 8]) == ["x", "y", "0", "1"]


def test_for_in_break_continue():
    src = """
export default function(a) {
  const out = [];
  for (const i in a) {
    if (i === "1") continue;
    if (i === "3") break;
    out.push(i);
  }
  return out;
}
"""
    assert run1(src, [1, 2, 3, 4, 5]) == ["0", "2"]


def test_switch_forin_end_to_end_scrape(spark, tmp_path):
    """Synthetic scrape script driving switch + for...in through the
    CLI."""
    from flyscrape_spark.cli import _run_once

    script = tmp_path / "kinds.js"
    script.write_text("""
export const config = {urls: ["https://shop.test/"]};

export default function ({ doc, url }) {
  const counts = {};
  doc.find("[data-kind]").map(function (s) {
    let bucket;
    switch (s.attr("data-kind")) {
      case "book":
      case "ebook": bucket = "books"; break;
      case "cd": bucket = "music"; break;
      default: bucket = "other";
    }
    counts[bucket] = (counts[bucket] || 0) + 1;
    return bucket;
  });
  const summary = [];
  for (const k in counts) summary.push(k + ":" + counts[k]);
  return {url, summary};
}
""")
    pages_path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        [("https://shop.test/", "shop.test", 200,
          '<i data-kind="book"></i><i data-kind="ebook"></i>'
          '<i data-kind="cd"></i><i data-kind="vinyl"></i>')],
        "url string, host string, status int, html string",
    ).write.mode("overwrite").parquet(pages_path)
    out_file = tmp_path / "out.json"
    _run_once(str(script), {"output.file": str(out_file)},
              spark=spark, pages_path=pages_path)
    rows = json.loads(out_file.read_text())
    assert rows[0]["data"]["summary"] == ["books:2", "music:1", "other:1"]
