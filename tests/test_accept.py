"""Smoke test of the acceptance runner (tools/accept.py).

The real gates need CIFAR-100 + pretrained weights (absent here — zero
egress); this proves the acceptance code path end-to-end on the synthetic
source: config resolution, both method stacks, the overall-metrics diff,
and the one-line ACCEPT records.
"""

import json

import tools.accept as accept


def test_accept_synthetic_smoke(capsys):
    rc = accept.main(["--synthetic", "--which", "both"])
    out = capsys.readouterr().out
    recs = [json.loads(l.split("ACCEPT ", 1)[1])
            for l in out.splitlines() if l.startswith("ACCEPT {")]
    assert rc == 0
    assert {r["gate"] for r in recs} == {"icarl", "l2p"}
    assert all(r["pass"] for r in recs)
    assert "ACCEPTANCE PASS" in out
