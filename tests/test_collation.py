"""Exact JDK-collator sort keys (reference Collators.java:14-33 wraps
java.text.Collator.getInstance() at TERTIARY; our vendored element
table + key builder must reproduce its compare() order exactly —
closing the r4 'ICU collation is dormant / fallback diverges' gap)."""

from __future__ import annotations

import os
import random
import shutil
import subprocess
import tempfile

import pytest

from blacklab_spark.search.collation import jdk_sort_key

JAVA_HOME = os.environ.get("JAVA_HOME", "")
JAVAC = os.path.join(JAVA_HOME, "bin", "javac")

SORTER_SRC = """
import java.text.*;
import java.util.*;
import java.nio.file.*;
import java.nio.charset.StandardCharsets;
public class SortList {
    public static void main(String[] a) throws Exception {
        Collator c = Collator.getInstance();
        c.setStrength(Collator.TERTIARY);
        List<String> ws = Files.readAllLines(Paths.get(a[0]), StandardCharsets.UTF_8);
        ws.sort((x, y) -> { int r = c.compare(x, y); return r != 0 ? r : x.compareTo(y); });
        Files.write(Paths.get(a[1]), String.join("\\n", ws).getBytes(StandardCharsets.UTF_8));
    }
}
"""


def test_known_orders():
    """Hand-checked orders incl. the cases the former three-strength
    fallback got wrong (multi-accent secondary weights, ß tertiary
    expansion, ignorable space/dash, unmapped chars)."""
    key = jdk_sort_key
    # acute (secondary 19) before grave (20) — codepoint order says the
    # opposite (é=U+00E9 > è=U+00E8): the r4 divergence, now exact
    assert key("éa") < key("èa")
    assert key("ea") < key("éa") < key("èa") < key("êa") < key("ëa")
    # ß = two s-primaries with tertiary marks: strasse < straße < STRASSE
    assert key("strasse") < key("straße") < key("STRASSE")
    # lowercase before uppercase (tertiary), letters group by primary
    assert key("apple") < key("Apple") < key("ápple") < key("zebra")
    # space/dash are primary-ignorable in the JDK sensitive collator:
    # 'ab' groups with 'a b' / 'a-b' at primary, secondaries order them
    assert key("a b") < key("a-b")  # space sec 1 < dash sec 109
    assert key("ab") < key("a b")   # no ignorable < ignorable present
    # unpaired completely-ignorables are skipped, paired ones compare
    assert key("a​b") == key("ab")
    assert key("​ ") < key(" ")
    # unmapped chars (marker + code units) sort after mapped ones
    assert key("z") < key("一") < key("\U0001f600")


@pytest.mark.skipif(not os.path.exists(JAVAC), reason="no JDK toolchain")
def test_order_identical_to_java_collator():
    """Differential golden: sort 2.5k adversarial strings with the REAL
    java.text.Collator (the object the reference wraps) and with our
    key; orders must be identical."""
    random.seed(20260821)
    bases = ["apple", "Apple", "APPLE", "ápple", "àpple", "âpple", "äpple",
             "zebra", "Zebra", "cote", "coté", "côte", "côté",
             "resume", "résumé", "résume", "resumé", "éa", "èa", "ea",
             "Ärger", "arger", "Aerger", "straße", "strasse", "STRASSE",
             "naïve", "naive", "Ναΐς", "ναις", "Москва", "москва",
             "a b", "a-b", "a_b", "ab", "a1", "A1", "a10", "a2",
             "ffi", "ﬃ", "①", "一二", "\U0001f600x", "x\U0001f600",
             "", " ", "-", "_", "e", "é", "è", "ê", "ë", "ē", "ĕ", "ė",
             "a​b", "ab​", "a\tb", "A-b", "a-B", "ä-b", "a‐b",
             "a\x01b", "\x07x", "​ ", " ́", "́ "]
    alpha = "aáàâäAÁeéèEßzZ -_​́̀¨œŒﬁ①ĳ\x01\x1f"
    words = bases + ["".join(random.choice(alpha)
                             for _ in range(random.randint(1, 6)))
                     for _ in range(2500)]
    words = [w for w in dict.fromkeys(words) if "\n" not in w]
    random.shuffle(words)
    d = tempfile.mkdtemp(prefix="jdkcoll_")
    try:
        src = os.path.join(d, "SortList.java")
        with open(src, "w") as f:
            f.write(SORTER_SRC)
        subprocess.run([JAVAC, "-encoding", "UTF-8", src], check=True, cwd=d)
        win, wout = os.path.join(d, "in.txt"), os.path.join(d, "out.txt")
        with open(win, "w") as f:
            f.write("\n".join(words))
        subprocess.run(
            [os.path.join(JAVA_HOME, "bin", "java"), "-cp", d, "SortList",
             win, wout], check=True)
        with open(wout) as f:
            java_sorted = f.read().split("\n")
    finally:
        shutil.rmtree(d, ignore_errors=True)
    py_sorted = sorted(words, key=lambda w: (jdk_sort_key(w), w))
    assert py_sorted == java_sorted


def test_table_regeneration_is_stable():
    """The vendored table matches what tools/gen_collation.py would
    produce against this JDK (guards accidental edits / JDK drift)."""
    if not os.path.exists(JAVAC):
        pytest.skip("no JDK toolchain")
    import importlib

    import tools.gen_collation as gen

    mod_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(gen.__file__))),
        "blacklab_spark", "search", "_jdk_collation.py",
    )
    with open(mod_path) as f:
        before = f.read()
    gen.main()
    with open(mod_path) as f:
        after = f.read()
    assert before == after
    importlib.invalidate_caches()
