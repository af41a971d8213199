"""TPU-tier tests: run on the REAL chip (VERDICT r1 item 7).

The CPU suite (tests/) is structurally blind to two classes of TPU-only
numeric bugs that were both shipped in round 1 and bisected out by hand
(commit 3bf5879): (1) f32 matmuls at default precision truncate operands
to bf16 per pass on TPU, silently re-ranking top-k; (2) out-of-range
dynamic_slice/dynamic_update_slice offsets clamp INCONSISTENTLY on TPU,
shearing chunked loops. This tier runs the regression checks on the real
device.

Usage (never concurrently with another TPU process — the chip grant is
exclusive on this box):

    python -m pytest tests_tpu/ -q          # ~10 min, mostly compiles

The whole directory is skipped when no TPU is attached.
"""

import pytest


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    import jax

    platform = jax.devices()[0].platform
    if platform not in ("tpu",):
        pytest.skip(f"TPU tier requires a TPU device (got {platform})")
