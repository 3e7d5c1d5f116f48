"""Round-4 session-2 jsvm addition: getters/setters — object-literal
``get x() {}`` / ``set x(v) {}`` and class accessors (static and
inherited included). JSON.stringify invokes own enumerable
object-literal getters; class (prototype) getters stay
un-serialized, like goja."""

from __future__ import annotations

import json

from flyscrape_spark.parse.jsvm import compile_module, js_json_stringify


def run1(src: str, *args):
    m = compile_module(src)
    return m.interp.call(m.default, list(args))


def test_object_literal_getter_this_bound():
    src = """
export default function() {
  const o = {first: "ada", last: "lovelace",
             get full() { return this.first + " " + this.last; }};
  return o.full;
}
"""
    assert run1(src) == "ada lovelace"


def test_object_literal_setter_and_pair():
    src = """
export default function() {
  const o = {_c: 0,
             get count() { return this._c; },
             set count(v) { this._c = v * 2; }};
  o.count = 21;
  return o.count;
}
"""
    assert run1(src) == 42


def test_setterless_write_is_sloppy_noop():
    src = """
export default function() {
  const o = {get x() { return 7; }};
  o.x = 99;
  return o.x;
}
"""
    assert run1(src) == 7


def test_get_set_still_usable_as_plain_keys():
    src = """
export default function() {
  const o = {get: 1, set: 2};
  const m = {get() { return 3; }};
  const sh = (function(get) { return {get}; })(4);
  return o.get + o.set + m.get() + sh.get;
}
"""
    assert run1(src) == 10


def test_class_accessor_inherited_and_static():
    src = """
class Page {
  constructor(url) { this.url = url; }
  get host() { return this.url.split("/")[2]; }
  static get kind() { return "page"; }
}
class Article extends Page {
  get slug() { return this.url.split("/").pop(); }
}
export default function() {
  const a = new Article("https://h.example/post/42");
  return [a.host, a.slug, Page.kind, Article.kind];
}
"""
    assert run1(src) == ["h.example", "42", "page", "page"]


def test_class_setter_routes_write():
    src = """
class Box {
  constructor() { this._v = 0; }
  get v() { return this._v; }
  set v(x) { this._v = x + 1; }
}
export default function() {
  const b = new Box();
  b.v = 10;
  return b.v;
}
"""
    assert run1(src) == 11


def test_stringify_invokes_literal_getters_not_class_getters():
    src = """
class C { get g() { return 1; } constructor() { this.own = 2; } }
export default function() {
  return {lit: {get x() { return 5; }, y: 6}, inst: new C()};
}
"""
    out = json.loads(js_json_stringify(run1(src)))
    # own enumerable literal getter serialized; prototype getter not
    assert out == {"lit": {"x": 5, "y": 6}, "inst": {"own": 2}}


def test_accessor_end_to_end_scrape_script(spark, tmp_path):
    """A synthetic scrape script using accessors end-to-end through
    the CLI (same harness as the regex/try-catch round)."""
    from flyscrape_spark.cli import _run_once

    script = tmp_path / "accessors.js"
    script.write_text("""
export const config = {urls: ["https://shop.test/"]};

class Listing {
  constructor(sel) { this.sel = sel; }
  get name() { return this.sel.find("h2").text(); }
  get price() { return Number(this.sel.find(".price").text()); }
}

export default function ({ doc, url }) {
  const page = {get n_items() { return doc.find(".item").length; }};
  const items = doc.find(".item").map(function (s) {
    const l = new Listing(s);
    return {name: l.name, price: l.price};
  });
  return {url, count: page.n_items, items};
}
""")
    pages_path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        [("https://shop.test/", "shop.test", 200,
          '<div class="item"><h2>A</h2><span class="price">3</span></div>'
          '<div class="item"><h2>B</h2><span class="price">5</span></div>')],
        "url string, host string, status int, html string",
    ).write.mode("overwrite").parquet(pages_path)
    out_file = tmp_path / "out.json"
    _run_once(str(script), {"output.file": str(out_file)},
              spark=spark, pages_path=pages_path)
    rows = json.loads(out_file.read_text())
    assert rows[0]["data"] == {
        "url": "https://shop.test/", "count": 2,
        "items": [{"name": "A", "price": 3}, {"name": "B", "price": 5}],
    }


# ---- round-5 advice fixes: computed-index + static-setter + ----------
# ---- enumeration parity with the member paths ------------------------

def test_computed_index_read_invokes_getter():
    """o["x"] and o.x are the SAME operation in JS — the computed
    path must invoke the getter, not leak the internal accessor."""
    src = """
export default function() {
  const o = {get x() { return 42; }};
  const k = "x";
  return [o["x"], o[k], o.x];
}
"""
    assert run1(src) == [42, 42, 42]


def test_computed_index_write_invokes_setter():
    src = """
export default function() {
  const o = {_v: 0, set x(v) { this._v = v + 1; },
             get x() { return this._v; }};
  o["x"] = 10;
  const k = "x";
  o[k] = o[k] + 100;
  return o.x;
}
"""
    assert run1(src) == 112


def test_computed_index_setterless_is_noop():
    src = """
export default function() {
  const o = {get x() { return 7; }};
  o["x"] = 99;
  return o["x"];
}
"""
    assert run1(src) == 7


def test_class_instance_computed_accessor():
    src = """
export default function() {
  class C { constructor() { this._v = 1; }
            get x() { return this._v * 10; }
            set x(v) { this._v = v; } }
  const c = new C();
  c["x"] = 5;
  return c["x"];
}
"""
    assert run1(src) == 50


def test_static_accessor_setter_not_clobbered():
    """C.x = v with `static set x(v)` must invoke the setter, not
    overwrite the accessor slot."""
    src = """
export default function() {
  class C { static get x() { return 42; }
            static set x(v) { C.stored = v * 2; } }
  C.x = 5;
  return [C.x, C.stored];
}
"""
    assert run1(src) == [42, 10]


def test_static_setterless_write_is_noop():
    src = """
export default function() {
  class C { static get x() { return 3; } }
  C.x = 99;
  return C.x;
}
"""
    assert run1(src) == 3


def test_forin_enumerates_setter_only_props():
    """Accessor properties are enumerable own properties regardless
    of getter presence."""
    src = """
export default function() {
  const o = {a: 1, set x(v) {}, get y() { return 2; }};
  const ks = [];
  for (const k in o) ks.push(k);
  return ks.sort();
}
"""
    assert run1(src) == ["a", "x", "y"]


def test_object_values_entries_invoke_getters():
    src = """
export default function() {
  const o = {a: 1, get b() { return 5; }};
  return [Object.keys(o), Object.values(o),
          Object.entries(o).map(e => e[0] + "=" + e[1])];
}
"""
    assert run1(src) == [["a", "b"], [1, 5], ["a=1", "b=5"]]


def test_object_assign_resolves_source_getters():
    src = """
export default function() {
  const src = {get v() { return 9; }};
  const t = Object.assign({}, src);
  return t.v;
}
"""
    assert run1(src) == 9
