"""Regenerate blacklab_spark/search/_jdk_collation.py from the local JDK.

The reference's term/hit sorts use the JDK default-locale collator at
TERTIARY strength (engine forwardindex/Collators.java:14-82 wraps
java.text.Collator.getInstance()). This tool dumps that collator's
per-codepoint collation elements (primary, secondary, tertiary — via
java.text.CollationElementIterator) for the scripts the engine serves
and vendors them as a Python table, so query-time sorts reproduce the
reference's order EXACTLY with no native Python dependency.

Run: python tools/gen_collation.py   (needs JAVA_HOME, writes the module)

The generated table is committed; regeneration is only needed against
a JDK whose collation rules changed (they have been stable for years —
java.text rules are frozen legacy data, unlike CLDR-tracking ICU).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

JAVA_SRC = r"""
import java.text.CollationElementIterator;
import java.text.Collator;
import java.text.RuleBasedCollator;

public class DumpCollation {
    public static void main(String[] args) throws Exception {
        RuleBasedCollator c = (RuleBasedCollator) Collator.getInstance();
        c.setStrength(Collator.TERTIARY);
        StringBuilder sb = new StringBuilder();
        int[][] ranges = {
            {0x0000, 0x009F}, {0x00A0, 0x024F},
            {0x0300, 0x036F}, {0x0370, 0x03FF}, {0x0400, 0x04FF},
            {0x1E00, 0x1EFF}, {0x2000, 0x206F}, {0x20A0, 0x20BF},
            {0x2150, 0x218B}, {0xFB00, 0xFB06},
        };
        for (int[] r : ranges) {
            for (int cp = r[0]; cp <= r[1]; cp++) {
                String s = new String(Character.toChars(cp));
                CollationElementIterator it = c.getCollationElementIterator(s);
                sb.setLength(0);
                int order;
                boolean any = false;
                while ((order = it.next()) != CollationElementIterator.NULLORDER) {
                    if (any) sb.append(';');
                    sb.append(CollationElementIterator.primaryOrder(order))
                      .append(',')
                      .append(CollationElementIterator.secondaryOrder(order))
                      .append(',')
                      .append(CollationElementIterator.tertiaryOrder(order));
                    any = true;
                }
                if (any) System.out.println(cp + "\t" + sb);
            }
        }
    }
}
"""

HEADER = '''\
"""JDK default-collator collation elements (GENERATED - do not edit).

Produced by tools/gen_collation.py from java.text.Collator.getInstance()
at TERTIARY strength - the exact collator the reference wraps
(engine forwardindex/Collators.java:14-82). ELEMENTS maps a codepoint
to its (primary, secondary, tertiary) element sequence; codepoints
absent here take the JDK's unmapped-char form, handled by the caller
(collation.jdk_sort_key): a 0x7FFF marker element followed by one
element per UTF-16 code unit.
"""

# fmt: off
ELEMENTS: dict[int, tuple[tuple[int, int, int], ...]] = {
'''


def main() -> None:
    java_home = os.environ.get("JAVA_HOME", "")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "DumpCollation.java")
        with open(src, "w") as f:
            f.write(JAVA_SRC)
        subprocess.run(
            [os.path.join(java_home, "bin", "javac"), "-encoding", "UTF-8", src],
            check=True, cwd=d,
        )
        out = subprocess.run(
            [os.path.join(java_home, "bin", "java"), "DumpCollation"],
            check=True, cwd=d, capture_output=True, text=True,
        ).stdout
    lines = []
    for line in out.splitlines():
        cp, els = line.split("\t")
        parts = ", ".join(
            "(" + e.replace(",", ", ") + ")" for e in els.split(";")
        )
        lines.append(f"    {cp}: ({parts},),")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "blacklab_spark", "search", "_jdk_collation.py",
    )
    with open(dest, "w") as f:
        f.write(HEADER)
        f.write("\n".join(lines))
        f.write("\n}\n# fmt: on\n")
    print(f"wrote {dest}: {len(lines)} codepoints", file=sys.stderr)


if __name__ == "__main__":
    main()
