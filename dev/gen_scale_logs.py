#!/usr/bin/env python3
"""Dev tool: replicate the reference XML fixture into /tmp/graft_scale/logs
(30 rollover files x 10 shifted replicas = 95,700 events) for
graft.ScaleSmokeSpec. With `x10`, write /tmp/graft_scale/logs10
(300 files = 957,000 events) for the 10x trace-operator scaling run in
graft.ScaleRegistrySpec; with `x100`, /tmp/graft_scale/logs100
(3000 files = 9,570,000 events, ~3.7 GB) for the true-100x trace probe.
Not part of the shipped engine."""
import re, os, sys, datetime

src = ('/root/reference/data/log_example/simlogs/'
       'trace.172.17.0.3.4500.1763869069.8tVoRN.0.1.xml')
nfiles, outdir = 30, '/tmp/graft_scale/logs'
if 'x10' in sys.argv[1:]:
    nfiles, outdir = 300, '/tmp/graft_scale/logs10'
if 'x100' in sys.argv[1:]:
    nfiles, outdir = 3000, '/tmp/graft_scale/logs100'
os.makedirs(outdir, exist_ok=True)
events = re.findall(r'<Event [^>]*/>', open(src).read())
# per-event (prefix, datetime, suffix) split so each replica is string
# concatenation, not a strptime+regex pass over every event again
PAT = re.compile(r'DateTime="([^"]*)"')
parts = []
for ev in events:
    m = PAT.search(ev)
    parts.append((ev[:m.start()] + 'DateTime="',
                  datetime.datetime.strptime(m.group(1), '%Y-%m-%dT%H:%M:%SZ'),
                  '"' + ev[m.end():]))
for f in range(nfiles):
    lines = ['<?xml version="1.0"?>', '<Trace>']
    for rep in range(10):
        shift = datetime.timedelta(seconds=(f * 10 + rep) * 120)
        lines += [pre + (t + shift).strftime('%Y-%m-%dT%H:%M:%SZ') + post
                  for pre, t, post in parts]
    lines.append('</Trace>')
    open(f'{outdir}/trace.10.0.0.1.4500.0.0.{f:04d}.1.xml',
         'w').write('\n'.join(lines))
print('wrote', len(os.listdir(outdir)), 'files,',
      len(events) * 10 * nfiles, 'events total')
