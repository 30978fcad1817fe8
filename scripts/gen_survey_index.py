#!/usr/bin/env python3
"""Regenerate SURVEY.md section 2.M (the per-module declared-query index)
from the shipped code. DEV TOOL ONLY.

Usage: gen_survey_index.py <verifyOutDir-with-oracle_sql.json>

Query->module mapping comes from the `"q_name" -> qMethod` registrations in
the sources; the oracle set from the given Verify dump's oracle_sql.json
(authoritative — regex-scraping the Scala oracle maps misses alias-style
entries like `"q_dedup_near" -> nearOracle`).
"""
import collections
import json
import pathlib
import re
import sys

# repo root derived from this script's own location, so the tool works
# from any checkout path
ROOT = pathlib.Path(__file__).resolve().parents[1]
ORDER = ['Relational', 'Aggregations', 'Joins', 'Windows', 'ScalarFuncs',
         'Udfs', 'StreamingAnalogs', 'Dedup', 'TextSim', 'Advanced',
         'Warehouse', 'ScaleOps', 'TrainingOps', 'Quality', 'Tpch',
         'Graph', 'Features', 'Mining', 'Formats']


def main(dump_dir):
    mod_of = {}
    for f in (ROOT / 'src/main/scala/graft').rglob('*.scala'):
        for m in re.finditer(r'"(q_[a-z0-9_]+)"\s*->\s*q[A-Z]', f.read_text()):
            mod_of[m.group(1)] = f.stem
    oracles = set(json.load(open(f'{dump_dir}/oracle_sql.json')))
    names = sorted(mod_of)
    no_oracle = sorted(set(names) - oracles)
    bymod = collections.defaultdict(list)
    for n in names:
        bymod[mod_of[n]].append(n)
    assert set(bymod) == set(ORDER), set(bymod) ^ set(ORDER)

    lines = ['### 2.M Complete declared-query index (generated from the shipped code)\n',
             'Every `SparkEntry.queries` entry by module; ★ marks the '
             f'{len(no_oracle)} no-oracle',
             'entries (genuinely approximate sketches, pinned by recall/error-bound',
             f'tests instead of a DuckDB hash match). {len(names)} declared / '
             f'{len(oracles & set(names))} oracle-matched.',
             'Regenerate with `scripts/gen_survey_index.py <verify-dump-dir>`.\n',
             '| Module | Queries |', '|---|---|']
    for m in ORDER:
        cells = ' '.join(f'`{q}`' + ('★' if q in no_oracle else '')
                         for q in bymod[m])
        lines.append(f'| `ops/{m}` ({len(bymod[m])}) | {cells} |')
    block = '\n'.join(lines) + '\n'

    p = ROOT / 'SURVEY.md'
    s = p.read_text()
    try:
        start = s.index('### 2.M Complete declared-query index')
        end = s.index('\n---\n\n## 3. Query lifecycle')
    except ValueError:
        sys.exit('SURVEY.md section markers not found ("### 2.M Complete '
                 'declared-query index" .. "## 3. Query lifecycle") — '
                 'refusing to rewrite; fix the headings or this script first')
    p.write_text(s[:start] + block + s[end:])
    print(f'{len(names)} declared / {len(oracles & set(names))} matched; '
          f'no-oracle: {no_oracle}')


if __name__ == '__main__':
    main(sys.argv[1])
