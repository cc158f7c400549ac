#!/usr/bin/env python3
"""Attribute a profiler trace to model slices via HLO op_name metadata.

    python tools/attribute_trace.py <trace-dir> <optimized-hlo.txt> [steps]

Unlike tools/parse_trace.py (which groups by XLA op KIND), this joins each
device event with the `op_name` metadata of its HLO instruction — the JAX
scope path, e.g. ``transpose(jvp(AssembledModel))/backbone/.../layer7_deconv/
upper_conv1/conv_general_dilated`` — and buckets per layer/phase. That is
the table perf work is planned against (BENCH_NOTES "slice table").

Produce the inputs with:
    BENCH_PROFILE=<trace-dir> BENCH_CONFIG=... python bench.py
    # optimized HLO text: jax.jit(fn).lower(*args).compile().as_text()
    # (see the recipe in BENCH_NOTES.md; bench.py shares the fn.)
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def scope_map(hlo_path):
    scope = {}
    with open(hlo_path) as f:
        for line in f:
            m = re.search(r'%([\w.\-]+) = .*op_name="([^"]+)"', line)
            if m:
                scope[m.group(1)] = m.group(2)
    return scope


def device_events(trace_dir):
    """-> (op events from the 'XLA Ops' device track, dispatch count).

    A capture can hold several dispatches of the same program; the
    'XLA Modules' track has one event per dispatch, which normalizes the
    per-step figures regardless of how many executions were profiled."""
    cands = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    if not cands:
        raise SystemExit(f'no *.trace.json.gz under {trace_dir}')
    data = json.load(gzip.open(max(cands, key=os.path.getmtime), 'rt'))
    ev = data['traceEvents']
    pid_names = {e['pid']: e['args'].get('name', '') for e in ev
                 if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    dev = {p for p, n in pid_names.items()
           if 'TPU' in n or 'Device' in n or 'XLA' in n}
    tid_names = {(e['pid'], e['tid']): e['args'].get('name', '') for e in ev
                 if e.get('ph') == 'M' and e.get('name') == 'thread_name'}
    op_tids = {k for k, n in tid_names.items()
               if k[0] in dev and n == 'XLA Ops'}
    mod_tids = {k for k, n in tid_names.items()
                if k[0] in dev and n == 'XLA Modules'}
    rows = [e for e in ev if e.get('ph') == 'X' and 'dur' in e
            and (e['pid'], e.get('tid')) in op_tids]
    if not rows:   # older captures without named threads
        rows = [e for e in ev
                if e.get('ph') == 'X' and 'dur' in e and e['pid'] in dev]
    dispatches = sum(1 for e in ev if e.get('ph') == 'X' and 'dur' in e
                     and (e['pid'], e.get('tid')) in mod_tids) or 1
    return rows, dispatches


def bucket(sc, name):
    if not sc:
        return 'unattr/' + name.split('.')[0].lstrip('%')
    s = sc.split('closed_call/')[-1]
    grad = s.startswith('transpose(jvp')
    key = None
    for t in s.split('/'):
        if re.match(r'layer\d|auxiliary_resnet|ScoreCNN|projection'
                    r'|feature_extractor|mask_predictor', t):
            key = t
            break
    if key is None:
        # 'warp' before 'triplet': the triplet head's tent warps should
        # bucket as loss-warp, not blend into the loss distances.
        for pat, b in [('generate_pairs', 'datagen'),
                       ('warp', 'loss-warp'), ('triplet', 'loss'),
                       ('dsac', 'dsac'),
                       ('clip_by_global_norm', 'opt'), ('adam', 'opt'),
                       ('compute_loss', 'loss')]:
            if pat in s:
                key = b
                break
    if key is None:
        key = s.split('/')[-1].split('.')[0][:24]
    return ('bwd:' if grad else 'fwd:') + key


def main():
    trace_dir, hlo_path = sys.argv[1], sys.argv[2]
    unroll = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scope = scope_map(hlo_path)
    agg = collections.Counter()
    cnt = collections.Counter()
    rows, dispatches = device_events(trace_dir)
    steps = dispatches * unroll
    print(f'{dispatches} dispatch(es) x {unroll} steps')
    for e in rows:
        nm = e['name'].lstrip('%')
        if nm.startswith('while') or nm.startswith('jit_') or nm == '0':
            continue
        b = bucket(scope.get(nm), nm)
        agg[b] += e['dur']
        cnt[b] += 1
    total = sum(agg.values())
    print(f'total attributed: {total / 1000 / steps:.2f} ms/step')
    for k, v in agg.most_common(50):
        print(f'{v / 1000 / steps:7.3f} ms {cnt[k] / steps:7.1f}  {k}')


if __name__ == '__main__':
    main()
