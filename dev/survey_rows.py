#!/usr/bin/env python3
"""Derive SURVEY.md §2's component count from the tables themselves
(r12 verdict #7): the 274-row figure lived in prose, so a renumber
could silently drift it. This script parses every markdown table
between '## §2' and '## §3', counts data rows (excluding header and
separator lines), checks row-ID uniqueness, and compares against the
'Status (round N)' prose count when present.

Usage: python3 dev/survey_rows.py   → prints per-section counts + total,
exits nonzero on duplicate IDs.
"""
import re, sys

lines = open("/root/repo/SURVEY.md").read().splitlines()
in_s2 = False
section = None
counts = {}
ids = []
for ln in lines:
    if ln.startswith("## §2"):
        in_s2 = True
        continue
    if in_s2 and ln.startswith("## "):
        break
    if not in_s2:
        continue
    if ln.startswith("### "):
        section = ln[4:].strip()
        continue
    m = re.match(r"\|\s*([^|]+?)\s*\|", ln)
    if not m:
        continue
    cell = m.group(1)
    if cell in ("#",) or set(cell) <= {"-", " ", ":"}:
        continue  # header / separator
    counts[section] = counts.get(section, 0) + 1
    ids.append(cell)

# the TPC-H / TPC-DS sections are backticked name LISTS, not tables:
# count query tokens there so the full §2 inventory (tables + both
# workload books) derives from the document
tpc = {"TPC-H": 0, "TPC-DS": 0}
in_s2 = False
section = None
buf = []
for ln in lines:
    if ln.startswith("## §2"):
        in_s2 = True
        continue
    if in_s2 and ln.startswith("## "):
        break
    if not in_s2:
        continue
    if ln.startswith("### "):
        section = ln[4:].strip()
        continue
    key = next((k for k in tpc if section and section.startswith(k)), None)
    if key:
        buf.append((key, ln))
for key in tpc:
    text_sec = "\n".join(l for k, l in buf if k == key)
    names = set()
    for block in re.findall(r"`([^`]*)`", text_sec, re.S):
        names.update(re.findall(r"\b(?:ds_q?\w+|q\d+_\w+)", block))
    tpc[key] = len(names)

dupes = sorted({i for i in ids if ids.count(i) > 1})
total = sum(counts.values())
for s, c in counts.items():
    print(f"{c:4d}  {s}")
print(f"{total:4d}  TOTAL §2 table rows")
for k, n in tpc.items():
    print(f"{n:4d}  {k} query book (backticked names)")
print(f"{total + sum(tpc.values()):4d}  TOTAL §2 components")
if dupes:
    print(f"DUPLICATE row IDs: {dupes}")
    sys.exit(1)

# cross-check against the prose count if the status paragraph names one
text = "\n".join(lines)
m = re.search(r"(\d+)\s+capability-table rows", text)
if m:
    prose = int(m.group(1))
    if prose != total:
        print(f"PROSE MISMATCH: status says {prose}, tables have {total}")
        sys.exit(1)
    print(f"prose count matches ({prose})")
print("OK")
