"""CI pins for the r7 multi-batch streaming checks.

``tools/streaming_evidence.py`` produces the committed
``STREAMING_r8.json`` artifact (r7-era runs wrote STREAMING_r7.json;
both are in the ledger); these tests re-run the three checks
that have no other pytest coverage (the session and anomaly
cross-batch merges already have dedicated tests in
test_properties.py) so a regression is caught by the suite, not only
by regenerating the artifact.  The checks encode two measured Spark
4.1.2 behaviors documented in the harness: cross-batch join state
(with fixtures away from the epoch-0 initial watermark) and the
one-batch-lagged late filter.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "streaming_evidence",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "streaming_evidence.py",
    ),
)
SE = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(SE)


@pytest.mark.parametrize(
    "check",
    ["check_dedup_xbatch", "check_join_xbatch", "check_tumbling_late_drop"],
)
def test_streaming_evidence_check(spark, tmp_path, check):
    result = getattr(SE, check)(spark, str(tmp_path))
    assert result["pass"], result
