"""JS interpreter (parse/jsvm.py + parse/jsbridge.py) — SURVEY §2.1
#24's language layer.

Part 1 ports the reference's own VM tests (/root/reference/
js_test.go) against the interpreter: scrape return shapes, params
(url/absoluteURL/scrape/follow), config extraction, imports,
arbitrary exports, compile errors.

Part 2 pins JS semantics the examples depend on where they differ
from Python (String.replace first-match, Array.sort string compare,
% sign, JSON.stringify undefined/NaN/Set handling).

Part 3 (Spark) runs the UNMODIFIED reference example scripts
(/root/reference/examples/*.js) end-to-end through the CLI against
the same fixture pages as the ported-.py tests — the strongest parity
statement: a flyscrape user's .js files run as-is.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from flyscrape_spark.parse.jsbridge import (
    compile_script,
    make_js_scrape_fn,
    run_js_script,
)
from flyscrape_spark.parse.jsvm import (
    JsCompileError,
    JsRuntimeError,
    UNDEFINED,
    compile_module,
    js_json_stringify,
)

HTML = """
<html><body><main><h1>headline</h1><p>paragraph</p></main></body></html>
"""

REF_EXAMPLES = "/root/reference/examples"


def run(script, html=HTML, url="http://localhost/", fetch=None):
    return run_js_script(compile_script(script), html, url, fetch=fetch)


# ------------------------------------------------- part 1: js_test.go

def test_scrape_object_and_params():  # js_test.go:40-79
    data, _ = run("""
    export const config = { url: "https://localhost/" }
    export default function({ doc, url }) {
        return { headline: doc.find("h1").text(),
                 body: doc.find("p").text(), url: url }
    }
    """)
    assert json.loads(data) == {"headline": "headline",
                                "body": "paragraph",
                                "url": "http://localhost/"}


@pytest.mark.parametrize("body,expect", [
    ("return null", None),            # js_test.go:80-96
    ("", None),                       # undefined, js_test.go:97-111
    ("return NaN", None),             # js_test.go:154-170
    ("return 'foo'", "foo"),          # js_test.go:112-131
    ("return [1,2,3]", [1, 2, 3]),    # js_test.go:132-153
])
def test_scrape_return_shapes(body, expect):
    data, _ = run("export default function() { %s }" % body)
    assert (None if data is None else json.loads(data)) == expect


def test_param_url():  # js_test.go:171-187
    data, _ = run("export default function({ url }) { return url; }")
    assert json.loads(data) == "http://localhost/"


def test_param_absolute_url():  # js_test.go:188-204
    data, _ = run(
        'export default function({ absoluteURL }) { return absoluteURL("/foo"); }')
    assert json.loads(data) == "http://localhost/foo"


def test_param_scrape():  # js_test.go:205-232
    data, _ = run("""
    export default function({ scrape }) {
        return scrape("/foo", function({ url }) {
            return { url: url, foo: "bar" };
        });
    }
    """, fetch=lambda u: "")
    assert json.loads(data) == {"url": "http://localhost/foo", "foo": "bar"}


def test_param_scrape_deep():  # js_test.go:233-262
    data, _ = run("""
    export default function({ scrape }) {
        return scrape("/foo/", function({ url, scrape }) {
            return { url: url,
                     deep: scrape("bar", function({ url }) { return url; }) };
        });
    }
    """, fetch=lambda u: "")
    assert json.loads(data) == {"url": "http://localhost/foo/",
                                "deep": "http://localhost/foo/bar"}


def test_param_follow():  # js_test.go:263-283
    data, follows = run(
        'export default function({ follow }) { follow("/foo") }')
    assert data is None
    assert follows == ["http://localhost/foo"]


def test_follow_unavailable_in_nested_scrape():
    # js.go:203-207: nested ScrapeParams carry no Follow hook
    with pytest.raises(JsRuntimeError):
        run("""
        export default function({ scrape }) {
            return scrape("/x", function({ follow }) { follow("/y"); });
        }
        """, fetch=lambda u: "")


def test_compile_error_positions():  # js_test.go:284-298
    with pytest.raises(JsCompileError) as err:
        compile_module('import foo;')
    assert err.value.line == 1


def test_config_extraction():  # js_test.go:299-329
    m = compile_script("""
    export const config = {
        url: 'http://localhost/',
        depth: 5,
        allowedDomains: ['example.com'],
    }
    export default function() {}
    """)
    assert m.config == {"url": "http://localhost/", "depth": 5,
                        "allowedDomains": ["example.com"]}


def test_imports_interop():  # js_test.go:330-358
    m = compile_module("""
    import A from "flyscrape"
    import { bar } from "flyscrape/foo"
    export const config = {}
    export default function() {}
    export const a = A.foo
    export const b = bar()
    """, imports={"flyscrape": {"foo": 10},
                  "flyscrape/foo": {"bar": lambda: "baz"}})
    assert m.exports["a"] == 10
    assert m.exports["b"] == "baz"


def test_arbitrary_exports():  # js_test.go:360-398
    m = compile_module("""
    export const config = {}
    export default function() {}
    export function foo() { return "bar"; }
    export const fooc = "bar"
    """)
    assert m.interp.call(m.exports["foo"], []) == "bar"
    assert m.exports["fooc"] == "bar"


def test_text_imports_resolve_relative():  # examples/urls_from_file.js
    src = open(os.path.join(REF_EXAMPLES, "urls_from_file.js")).read()
    m = compile_script(src, base_dir=REF_EXAMPLES)
    urls = [u for u in m.config["urls"] if u]
    assert urls and all(u.startswith("http") for u in urls)


# --------------------------------------- part 2: JS-vs-Python semantics

def test_string_replace_first_match_only():
    data, _ = run("""
    export default function() { return "61 points points".replace(" points", ""); }
    """)
    assert json.loads(data) == "61 points"


def test_array_sort_default_is_string_compare():
    data, _ = run("export default function() { return [10, 9, 1].sort(); }")
    assert json.loads(data) == [1, 10, 9]


def test_modulo_takes_dividend_sign():
    data, _ = run("export default function() { return [-1 % 3, 7 % -2]; }")
    assert json.loads(data) == [-1, 1]


def test_division_is_float_and_template_literals():
    data, _ = run("""
    export default function() { const x = 7 / 2; return `v=${x}`; }
    """)
    assert json.loads(data) == "v=3.5"


def test_json_stringify_semantics():
    assert js_json_stringify(UNDEFINED) is None
    assert js_json_stringify({"a": UNDEFINED, "b": 1}) == '{"b":1}'
    assert js_json_stringify([UNDEFINED, 1]) == "[null,1]"
    assert js_json_stringify(float("nan")) == "null"
    assert js_json_stringify(2.0) == "2"
    data, _ = run(
        "export default function() { return { s: new Set([1,2]) }; }")
    assert json.loads(data) == {"s": {}}  # JSON.stringify(new Set) === {}


def test_set_spread_and_boolean_filter():  # browser.js patterns
    data, _ = run("""
    export default function() {
        const xs = [...new Set(["a", "", "b", "a", null])].filter(Boolean);
        return xs;
    }
    """)
    assert json.loads(data) == ["a", "b"]


def test_destructuring_defaults_and_rename():
    data, _ = run("""
    export default function() {
        const { a: x, b = 5 } = { a: 1 };
        const [p, , q] = [1, 2, 3];
        return { x, b, p, q };
    }
    """)
    assert json.loads(data) == {"x": 1, "b": 5, "p": 1, "q": 3}


def test_helper_function_hoisting():  # download.js calls basename later
    data, _ = run("""
    export default function() { return basename("a/b/c.png"); }
    function basename(path) { return path.split("/").slice(-1)[0]; }
    """)
    assert json.loads(data) == "c.png"


def test_element_api_camelcase_bridge():
    html = ('<div class="a"><span id="s" data-x="1">one</span>'
            "<b>two</b></div>")
    data, _ = run("""
    export default function({ doc }) {
        const span = doc.find("span");
        return { has: span.hasAttr("data-x"), cls: doc.find("div").hasClass("a"),
                 nxt: span.next().text(), n: span.name() };
    }
    """, html=html)
    assert json.loads(data) == {"has": True, "cls": True,
                                "nxt": "two", "n": "span"}


def test_loops_and_control_flow():
    data, _ = run("""
    export default function() {
        let total = 0;
        for (let i = 0; i < 10; i++) {
            if (i === 3) continue;
            if (i > 5) break;
            total += i;
        }
        let j = 0;
        while (j < 3) { j++; }
        const words = [];
        for (const w of ["x", "y"]) words.push(w.toUpperCase());
        return { total, j, words };
    }
    """)
    assert json.loads(data) == {"total": 12, "j": 3, "words": ["X", "Y"]}


def test_scrape_fn_adapter_matches_sequential_oracle():
    """make_js_scrape_fn bridges to the Python run_script path."""
    from flyscrape_spark.parse.script import ScriptContext, Sel
    from flyscrape_spark.parse.html import parse_html

    fn = make_js_scrape_fn(
        'export default function({ doc }) { return doc.find("h1").text(); }')
    ctx = ScriptContext(Sel([parse_html(HTML)]), "http://x/")
    ctx._html = HTML
    assert fn(ctx) == "headline"


def test_unsupported_features_error_cleanly():
    # generators stay out of scope (classes joined the supported
    # surface in round 4; getters/setters in round-4 session 2 —
    # see test_jsvm_accessors.py)
    with pytest.raises((JsCompileError, JsRuntimeError)):
        m = compile_module(
            "export default function* gen() { yield 1; }")
        m.interp.call(m.default, [])
    with pytest.raises((JsCompileError, JsRuntimeError)):
        compile_module("class G { *gen() { yield 1; } }\n"
                       "export default function() { return 0; }")


def test_classes_end_to_end():
    # round-4: ES2015 classes — ctor/fields/methods/static/extends/
    # super/instanceof/this-binding (object literals too)
    m = compile_module("""
class Animal {
  legs = 4;
  static kingdom = "Animalia";
  constructor(name) { this.name = name; }
  speak() { return this.name + " speaks"; }
}
class Dog extends Animal {
  constructor(name, breed) { super(name); this.breed = breed; }
  speak() { return super.speak() + " woof"; }
  lexical() { const f = () => this.legs; return f(); }
}
const lit = { n: 5, double() { return this.n * 2; } };
export default function() {
  const d = new Dog("Rex", "lab");
  let caught = "";
  try { throw new TypeError("boom"); } catch (e) {
    caught = (e instanceof TypeError) && (e instanceof Error)
      ? e.message : "no";
  }
  return {
    speak: d.speak(), isAnimal: d instanceof Animal,
    legs: d.legs, arrowThis: d.lexical(),
    statics: Animal.kingdom, literalThis: lit.double(),
    keys: Object.keys(d), json: JSON.stringify(d),
    t: typeof Dog, caught: caught,
  };
}
""")
    out = m.interp.call(m.exports["default"], [])
    assert out["speak"] == "Rex speaks woof"
    assert out["isAnimal"] is True
    assert out["legs"] == 4 and out["arrowThis"] == 4
    assert out["statics"] == "Animalia"
    assert out["literalThis"] == 10
    assert out["keys"] == ["legs", "name", "breed"]
    assert out["json"] == '{"legs":4,"name":"Rex","breed":"lab"}'
    assert out["t"] == "function"
    assert out["caught"] == "boom"


def test_function_constructor_and_class_expression():
    m = compile_module("""
function Point(x, y) { this.x = x; this.y = y; }
const C = class { constructor() { this.v = 1; } };
class D extends C {}
export default function() {
  const p = new Point(1, 2);
  let err = "";
  try { C(); } catch (e) { err = e.message; }
  return {sum: p.x + p.y, v: new D().v,
          needsNew: err.indexOf("new") >= 0};
}
""")
    out = m.interp.call(m.exports["default"], [])
    assert out == {"sum": 3, "v": 1, "needsNew": True}


def test_regex_literal_supported():
    # round-4: regex literals are in scope (was an unsupported-form
    # pin through round 3)
    m = compile_module(
        "export default function() { return /re/.test('pre/post'); }")
    assert m.interp.call(m.default, []) is True


def test_async_await_end_to_end():
    # round-4: async/await with synchronous resolution (no event
    # loop, mirroring the reference's synchronous per-page goja call,
    # js.go:155-163): settled promises, combinators, rejection =
    # throw, then/catch chains, async methods and arrows
    m = compile_module("""
async function double(x) {
  if (x < 0) throw new Error("neg");
  return x * 2;
}
const inc = async v => v + 1;
class Loader {
  constructor(base) { this.base = base; }
  async load(p) { return this.base + "/" + p; }
  static async make() { return new Loader("root"); }
}
export default async function() {
  const a = await double(4);
  const b = await inc(a);
  const all = await Promise.all([1, Promise.resolve(2), inc(2)]);
  let caught = "";
  try { await double(-1); } catch (e) { caught = e.message; }
  const chained = await Promise.resolve(5).then(v => v * 10);
  const recovered = await Promise.reject(new Error("boom"))
    .catch(e => "rec:" + e.message);
  const executed = await new Promise((resolve, reject) => resolve(42));
  const settled = await Promise.allSettled(
    [Promise.resolve(1), Promise.reject("bad")]);
  const l = await Loader.make();
  return {a, b, all, caught, chained, recovered, executed,
          s0: settled[0].status, s1: settled[1].reason,
          viaMethod: await l.load("x"),
          isPromise: double(1) instanceof Promise,
          plain: await 7};
}
""")
    out = m.interp.call(m.exports["default"], [])
    assert out.state == "fulfilled"
    assert out.value == {
        "a": 8, "b": 9, "all": [1, 2, 3], "caught": "neg",
        "chained": 50, "recovered": "rec:boom", "executed": 42,
        "s0": "fulfilled", "s1": "bad", "viaMethod": "root/x",
        "isPromise": True, "plain": 7,
    }


def test_async_rejection_and_identifier_ambiguity():
    # an unhandled rejection propagates out of the async fn as a
    # rejected promise; `async` stays usable as a plain identifier
    m = compile_module("""
function async(x) { return x + 1; }   // fn literally named async
const obj = { async: 7 };
export default async function() {
  return [async(5), obj.async];
}
""")
    out = m.interp.call(m.exports["default"], [])
    assert out.state == "fulfilled" and out.value == [6, 7]

    m2 = compile_module(
        "export default async function() {"
        " await Promise.reject(new Error('die')); return 1; }")
    out2 = m2.interp.call(m2.exports["default"], [])
    assert out2.state == "rejected"
    assert out2.value.message == "die"

    # a promise the executor never settles can never settle later
    # (no event loop): awaiting it raises a clear error, not a hang
    m3 = compile_module(
        "export default async function() {"
        " return await new Promise((res, rej) => {}); }")
    out3 = m3.interp.call(m3.exports["default"], [])
    assert out3.state == "rejected"
    assert "pending" in out3.value.message


def test_async_scrape_script_through_bridge():
    # a wild async scrape function runs through the same bridge as
    # sync ones: the settled promise is unwrapped, JSON comes out
    src = """
export default async function ({ doc, absoluteURL }) {
  const title = await Promise.resolve(doc.find("h1").text());
  return { title, link: absoluteURL("/next") };
}
"""
    module = compile_script(src)
    data, follows = run_js_script(
        module, "<html><h1>Hello</h1></html>", "https://a.example/p")
    assert json.loads(data) == {
        "title": "Hello", "link": "https://a.example/next"}


# ------------------------- part 3: reference .js files end-to-end (Spark)

def _run_reference_js(spark, tmp_path, name, pages, overrides=None):
    from flyscrape_spark.cli import _run_once

    pages_path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        pages, "url string, host string, status int, html string"
    ).write.mode("overwrite").parquet(pages_path)
    out_file = tmp_path / "out.json"
    _run_once(
        os.path.join(REF_EXAMPLES, f"{name}.js"),
        {"output.file": str(out_file), **(overrides or {})},
        spark=spark, pages_path=pages_path,
    )
    return json.loads(out_file.read_text())


def test_reference_hackernews_js_runs_unmodified(spark, tmp_path):
    from tests.test_examples import FRONT, HN, PAGE2, posts_of

    rows = _run_reference_js(spark, tmp_path, "hackernews", [
        (f"https://{HN}/", HN, 200, FRONT),
        (f"https://{HN}/news?p=2", HN, 200, PAGE2),
    ])
    assert {r["url"] for r in rows} == {f"https://{HN}/",
                                        f"https://{HN}/news?p=2"}
    front = posts_of(rows, f"https://{HN}/")
    assert front[0] == {"url": "https://story.one/", "user": "alice",
                        "title": "Story One", "points": "101",
                        "created": "2026-01-01T00:00:00"}


def test_reference_manual_follow_js_runs_unmodified(spark, tmp_path):
    from tests.test_examples import FRONT, HN, PAGE2

    rows = _run_reference_js(spark, tmp_path, "hackernews_manual_follow", [
        (f"https://{HN}/", HN, 200, FRONT),
        (f"https://{HN}/news?p=2", HN, 200, PAGE2),
    ])
    by_url = {r["url"]: r["data"] for r in rows}
    # config follow: [] — only the manual follow(next) enqueues page 2
    assert set(by_url) == {f"https://{HN}/", f"https://{HN}/news?p=2"}
    assert by_url[f"https://{HN}/"]["next"] == "news?p=2"


def test_reference_with_comments_js_nested_scrape(spark, tmp_path):
    from tests.test_examples import FRONT, HN

    comments = ('<html><body><table><tr class="comtr"><td>'
                '<a class="hnuser">carol</a>'
                '<div class="commtext">interesting</div>'
                "</td></tr></table></body></html>")
    rows = _run_reference_js(spark, tmp_path, "hackernews_with_comments", [
        (f"https://{HN}/", HN, 200, FRONT),
        (f"https://{HN}/item?id=1", HN, 200, comments),
    ])
    data = rows[0]["data"]
    assert data["title"] == "Story One"
    assert data["comments"] == [{"author": "carol", "text": "interesting"}]


def test_reference_urls_from_file_js_runs_unmodified(spark, tmp_path):
    urls = [u for u in
            open(os.path.join(REF_EXAMPLES, "urls.txt")).read().split("\n")
            if u]
    pages = [(u, u.split("/")[2], 200,
              f"<html><head><title> T{i} </title></head></html>")
             for i, u in enumerate(urls)]
    rows = _run_reference_js(spark, tmp_path, "urls_from_file", pages)
    assert {r["data"]["title"] for r in rows} == \
        {f"T{i}" for i in range(len(urls))}
