from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nise_dedup.config import DedupConfig  # noqa: E402
from nise_dedup.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(master="local[4]",
                      cfg=DedupConfig(shuffle_partitions=8))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return DedupConfig()
