#!/usr/bin/env python3
"""Dev tool: replicate the reference XML fixture into /tmp/graft_scale/logs
(30 rollover files x 10 shifted replicas = 95,700 events) for
graft.ScaleSmokeSpec. With `x10`, also write /tmp/graft_scale/logs10
(300 files = 957,000 events) for the 10x trace-operator scaling run in
graft.ScaleRegistrySpec. Not part of the shipped engine."""
import re, os, sys, datetime

src = ('/root/reference/data/log_example/simlogs/'
       'trace.172.17.0.3.4500.1763869069.8tVoRN.0.1.xml')
nfiles = 300 if 'x10' in sys.argv[1:] else 30
outdir = ('/tmp/graft_scale/logs10' if nfiles == 300
          else '/tmp/graft_scale/logs')
os.makedirs(outdir, exist_ok=True)
events = re.findall(r'<Event [^>]*/>', open(src).read())
for f in range(nfiles):
    lines = ['<?xml version="1.0"?>', '<Trace>']
    for rep in range(10):
        shift = (f * 10 + rep) * 120
        def bump(m):
            t = datetime.datetime.strptime(m.group(1), '%Y-%m-%dT%H:%M:%SZ')
            return ('DateTime="%s"' %
                    (t + datetime.timedelta(seconds=shift))
                    .strftime('%Y-%m-%dT%H:%M:%SZ'))
        lines += [re.sub(r'DateTime="([^"]*)"', bump, ev) for ev in events]
    lines.append('</Trace>')
    open(f'{outdir}/trace.10.0.0.1.4500.0.0.{f:03d}.1.xml',
         'w').write('\n'.join(lines))
print('wrote', len(os.listdir(outdir)), 'files,',
      len(events) * 10 * nfiles, 'events total')
