#!/usr/bin/env python3
"""Summarize a jax.profiler trace: top device ops by total duration.

    python tools/parse_trace.py <dir-or-trace.json.gz> [topk]

Groups XLA op instances by a normalized name (fusion.123 -> fusion; the
op_name metadata — e.g. the HLO category like 'convolution' or the
jax scope — is preferred when present).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(path):
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, '**', '*.trace.json.gz'),
                          recursive=True)
        if not cands:
            raise SystemExit(f'no *.trace.json.gz under {path}')
        path = max(cands, key=os.path.getmtime)
    sys.stderr.write(f'reading {path}\n')
    with gzip.open(path, 'rt') as f:
        return json.load(f)


def main():
    path = sys.argv[1]
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    data = load_events(path)
    events = data['traceEvents']

    # Device tracks: process names containing TPU/device (varies by
    # backend); fall back to all complete events with 'dur'.
    pid_names = {e['pid']: e['args'].get('name', '')
                 for e in events
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'
                 and 'args' in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r'TPU|/device|Device', name or '')}

    total = collections.Counter()
    count = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        if device_pids and e.get('pid') not in device_pids:
            continue
        name = e.get('name', '?')
        args = e.get('args') or {}
        longname = args.get('long_name') or args.get('tf_op') or ''
        base = re.sub(r'[.\d]+$', '', name)
        key = base
        m = re.search(r'([\w.]+)\[', longname)
        if m:
            key = f'{base}:{m.group(1)}'
        total[key] += e['dur']
        count[key] += 1
        wall += e['dur']

    print(f'{"us_total":>12} {"n":>6}  op  (device total {wall/1e3:.2f} ms)')
    for key, us in total.most_common(topk):
        print(f'{us:12.0f} {count[key]:6d}  {key}')


if __name__ == '__main__':
    main()
