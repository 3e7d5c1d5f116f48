"""Round-5 jsvm additions: labeled statements (break/continue with a
label across every loop form, labeled blocks, chained labels, ASI)
and computed member names in classes. Shrinks the documented
out-of-scope list to generators + prototype mutation only."""

from __future__ import annotations

import pytest

from flyscrape_spark.parse.jsvm import JsRuntimeError, compile_module


def run1(src: str, *args):
    m = compile_module(src)
    return m.interp.call(m.default, list(args))


def test_labeled_break_nested_for():
    src = """
export default function() {
  const hits = [];
  outer: for (let i = 0; i < 4; i++) {
    for (let j = 0; j < 4; j++) {
      if (i === 2 && j === 1) break outer;
      hits.push(i * 10 + j);
    }
  }
  return hits;
}
"""
    assert run1(src) == [0, 1, 2, 3, 10, 11, 12, 13, 20]


def test_labeled_continue_nested_for():
    src = """
export default function() {
  const hits = [];
  outer: for (let i = 0; i < 3; i++) {
    for (let j = 0; j < 3; j++) {
      if (j === 1) continue outer;
      hits.push(i * 10 + j);
    }
    hits.push(-1);   // never reached: continue outer skips it
  }
  return hits;
}
"""
    assert run1(src) == [0, 10, 20]


def test_labeled_while_and_forof():
    src = """
export default function() {
  let n = 0;
  loop: while (true) {
    for (const x of [1, 2, 3]) {
      n += x;
      if (n > 4) break loop;
    }
  }
  return n;
}
"""
    assert run1(src) == 6  # 1+2+3 -> 6 > 4 on the second pass? no: 1,3,6 -> breaks at 6


def test_labeled_forin_continue():
    src = """
export default function() {
  const o = {a: 1, b: 2, c: 3};
  const ks = [];
  outer: for (const k in o) {
    for (let i = 0; i < 2; i++) {
      if (k === "b") continue outer;
    }
    ks.push(k);
  }
  return ks;
}
"""
    assert run1(src) == ["a", "c"]


def test_unlabeled_break_still_nearest_loop():
    src = """
export default function() {
  const hits = [];
  outer: for (let i = 0; i < 2; i++) {
    for (let j = 0; j < 5; j++) {
      if (j === 1) break;
      hits.push(i * 10 + j);
    }
  }
  return hits;
}
"""
    assert run1(src) == [0, 10]


def test_labeled_block_break():
    src = """
export default function() {
  let v = 1;
  blk: {
    v = 2;
    if (v === 2) break blk;
    v = 3;
  }
  return v;
}
"""
    assert run1(src) == 2


def test_chained_labels_bind_same_loop():
    src = """
export default function() {
  let n = 0;
  a: b: for (let i = 0; i < 10; i++) {
    n = i;
    if (i === 2) break a;
  }
  return n;
}
"""
    assert run1(src) == 2


def test_break_label_through_switch():
    """break outer inside a switch must exit the labeled loop, not
    just the switch."""
    src = """
export default function() {
  const hits = [];
  outer: for (let i = 0; i < 5; i++) {
    switch (i) {
      case 2: break outer;
      default: hits.push(i);
    }
  }
  return hits;
}
"""
    assert run1(src) == [0, 1]


def test_asi_break_newline_label_is_plain_break():
    """ASI: a newline between break and an identifier terminates the
    break — the identifier is a separate expression statement."""
    src = """
export default function() {
  const hits = [];
  const outer = 0;
  for (let i = 0; i < 3; i++) {
    hits.push(i);
    if (i === 1) { break
      outer; }
  }
  return hits;
}
"""
    assert run1(src) == [0, 1]


def test_continue_on_non_loop_label_raises():
    src = """
export default function() {
  blk: { continue blk; }
  return 1;
}
"""
    with pytest.raises(JsRuntimeError):
        run1(src)


def test_label_in_do_while():
    src = """
export default function() {
  let i = 0, n = 0;
  outer: do {
    i++;
    for (;;) { continue outer; }
  } while (i < 3);
  return i;
}
"""
    assert run1(src) == 3


# ---- computed member names in classes --------------------------------

def test_computed_method_name():
    src = """
export default function() {
  const key = "he" + "llo";
  class C { [key]() { return 42; } }
  return new C().hello();
}
"""
    assert run1(src) == 42


def test_computed_static_method_name():
    src = """
export default function() {
  const k = "make";
  class C { static [k]() { return "made"; } }
  return C.make();
}
"""
    assert run1(src) == "made"


def test_computed_accessor_names():
    src = """
export default function() {
  const g = "x", s = "x";
  class C {
    constructor() { this._v = 5; }
    get [g]() { return this._v; }
    set [s](v) { this._v = v * 2; }
  }
  const c = new C();
  c.x = 10;
  return c.x;
}
"""
    assert run1(src) == 20


def test_computed_name_evaluated_at_class_build():
    src = """
export default function() {
  let k = "first";
  class C { [k]() { return 1; } }
  k = "second";
  const c = new C();
  return [typeof c.first, typeof c.second];
}
"""
    assert run1(src) == ["function", "undefined"]


def test_ternary_not_mistaken_for_label():
    src = """
export default function(x) {
  const y = x ? "yes" : "no";
  return y;
}
"""
    assert run1(src, 1) == "yes"
