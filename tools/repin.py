#!/usr/bin/env python3
"""Splice graft.PinGen output into SparkEntry.scala's pin regions.

PinGen prints each regenerated pin constant between `// PIN-SPLICE <name>`
and `// PIN-SPLICE-END` lines; SparkEntry.scala carries matching
`// PIN-BEGIN(<name>)` / `// PIN-END(<name>)` markers around each pinned
literal. This script replaces the region between each BEGIN/END pair
(markers kept) with the freshly measured block, so a codec or MLlib drift
is a one-command re-pin with a reviewable `git diff` instead of
hand-copied literals. Fails loudly if a block has no matching markers —
a renamed pin without a marker update would otherwise silently keep the
stale values."""
import re
import sys

# sbt prefixes every runMain output line with "[info] " — strip it so the
# markers and block bodies parse whether PinGen ran bare or under sbt
pingen_out = "\n".join(
    re.sub(r"^\[info\] ?", "", ln) for ln in open(sys.argv[1]).read().splitlines()
) + "\n"
target = sys.argv[2] if len(sys.argv) > 2 else "src/main/scala/graft/SparkEntry.scala"

blocks = dict(re.findall(r"^// PIN-SPLICE (\w+)\n(.*?)^// PIN-SPLICE-END$",
                         pingen_out, re.S | re.M))
if not blocks:
    sys.exit("repin: no PIN-SPLICE blocks found in PinGen output")

src = open(target).read()
for name, body in sorted(blocks.items()):
    pat = re.compile(
        r"(// PIN-BEGIN\(%s\)[^\n]*\n).*?(^  // PIN-END\(%s\))" % (name, name),
        re.S | re.M)
    if not pat.search(src):
        sys.exit(f"repin: no PIN-BEGIN({name})/PIN-END({name}) markers in {target}")
    src = pat.sub(lambda m: m.group(1) + body + m.group(2), src, count=1)

open(target, "w").write(src)
print("repin: spliced " + ", ".join(sorted(blocks)) + f" into {target}")
