#!/usr/bin/env python3
"""Generate QUERIES.md — an index of the full SparkEntry.queries surface:
query name -> defining file:line -> first scaladoc sentence -> scale posture
(the "Shape:"/"Scale shape:" sentence of the same scaladoc, when present).

Scripted sweep of the module maps (round-10 verdict item 7): parses each
`"q_name" -> qFunc` entry in the queries/*.scala `queries: Map` blocks,
locates `val qFunc` / `def qFunc`, and lifts its doc comment. Re-run after
adding queries; the file is checked in so the surface is discoverable
without reading 14 modules.

Usage: python3 scripts/gen_queries_md.py > QUERIES.md  (run from repo root)
"""
import os, re, sys, glob

QDIR = "src/main/scala/graft/queries"

def strip_doc(block_lines):
    out = []
    for ln in block_lines:
        t = ln.strip()
        t = re.sub(r"^/\*\*?", "", t)
        t = re.sub(r"^\*/?\s?", "", t)
        t = t.replace("*/", "")
        out.append(t)
    return " ".join(x for x in out if x).strip()

def first_sentence(text, limit=220):
    text = re.sub(r"\[\[([^\]]+)\]\]", r"\1", text)
    text = re.sub(r"\s+", " ", text).strip()
    # cut at the first sentence end that is followed by a space+capital,
    # else at an em-dash clause boundary, else hard-truncate
    m = re.search(r"(?<=[.!?])\s+(?=[A-Z(])", text)
    s = text[: m.start() + 1] if m else text
    if len(s) > limit:
        cut = s.rfind(" ", 0, limit)
        s = s[: cut if cut > 0 else limit] + "…"
    return s

def doc_for(lines, idx):
    """doc comment ending directly above line idx (0-based)."""
    j = idx - 1
    while j >= 0 and (not lines[j].strip() or lines[j].strip().startswith("//")):
        j -= 1
    if j < 0 or not lines[j].strip().endswith("*/"):
        return ""
    end = j
    while j >= 0 and "/**" not in lines[j]:
        j -= 1
    if j < 0:
        return ""
    return strip_doc(lines[j : end + 1])

def posture_of(doc):
    m = re.search(r"(?:Scale shape|Shape|Scale posture|Scale)\s*:\s*(.*)", doc)
    return first_sentence(m.group(1), 200) if m else ""

entries = []  # (module, qname, file, line, summary, posture)
for path in sorted(glob.glob(f"{QDIR}/*.scala")):
    src = open(path).read()
    lines = src.split("\n")
    module = os.path.basename(path).removesuffix(".scala")
    # map entries: "q_name" -> target  (target = qFunc or qFunc(...) etc.)
    mapping = {}
    for m in re.finditer(
            r'"(q[\w]+)"\s*->\s*([A-Za-z_][\w.]*(?:\(\s*[A-Za-z_][\w.]*\s*\))?)', src):
        tgt = m.group(2)
        # wrapper call like runSql(sqlCte): index the ARGUMENT's doc
        call = re.match(r"[\w.]+\(\s*([A-Za-z_][\w.]*)\s*\)", tgt)
        mapping.setdefault(m.group(1), call.group(1) if call else tgt)
    # definition line per val/def name
    defline = {}
    for i, ln in enumerate(lines):
        dm = re.match(r"\s*(?:private\s+)?(?:val|def)\s+([A-Za-z_]\w*)\b", ln)
        if dm:
            defline.setdefault(dm.group(1), i)
    for qname, target in sorted(mapping.items()):
        tgt = target.split(".")[-1]
        if tgt in defline:
            i = defline[tgt]
            doc = doc_for(lines, i)
        else:  # inline lambda in the map — use map-entry line, no doc
            i = src[: src.index(f'"{qname}"')].count("\n")
            doc = ""
        entries.append((module, qname, path, i + 1,
                        first_sentence(doc) if doc else "—",
                        posture_of(doc)))

print("# QUERIES — generated index of the SparkEntry.queries surface")
print()
print(f"{len(entries)} queries. Regenerate with "
      "`python3 scripts/gen_queries_md.py > QUERIES.md`.")
print()
for module in sorted(set(e[0] for e in entries)):
    rows = [e for e in entries if e[0] == module]
    print(f"## {module} ({len(rows)})")
    print()
    print("| query | where | what | scale posture |")
    print("|---|---|---|---|")
    for _, q, path, line, summary, posture in rows:
        summary = summary.replace("|", "\\|")
        posture = posture.replace("|", "\\|")
        print(f"| `{q}` | `{path}:{line}` | {summary} | {posture} |")
    print()
