import os

import pytest

from miso_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("miso_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def registry(spark):
    from miso_spark.sources import SourceRegistry

    return SourceRegistry(spark).register_parquet_dir("t", SF_DIR)


@pytest.fixture(scope="session")
def compiler(registry):
    from miso_spark.compiler import Compiler

    return Compiler(registry)


@pytest.fixture(autouse=True)
def _hang_watchdog(request):
    """Hard per-test hang guard. r11 and r12 each had one property-soak
    run hang for 30-55 minutes and get killed externally WITHOUT a
    stack (never reproduced under observation). pytest.ini's
    faulthandler_timeout=900 soft-dumps stacks but keeps running (and
    owns faulthandler's single global timer, so this can't use
    dump_traceback_later too); this timer THREAD dumps every thread's
    stack AND exits the process at 30 minutes per test — ~6x the
    slowest legitimate test — so the next occurrence pins its test
    name and stack instead of earning another unexplained-precedent
    note. r13 evidence (the watchdog fired twice and SOLVED the
    mystery): both firings caught hypothesis SHRINKING a Spark-backed
    failing property — after a find, the shrinker re-runs hundreds of
    candidate examples, each costing several Spark jobs, easily 30-55
    minutes inside ONE test call; the main thread was actively
    progressing (rewrite.py hot frames), never deadlocked. That is
    exactly the r11/r12 killed-soak signature, and both of those
    rounds' soaks had live differential finds to shrink. Workflow when
    this fires: re-run the named test with HYPOTHESIS_PROFILE=noshrink
    (registered below) — the cached failure replays in seconds with a
    full (unshrunk) falsifying example."""
    import faulthandler
    import os
    import sys
    import threading

    name = request.node.nodeid

    def _abort():
        sys.stderr.write(
            f"\n=== hang watchdog: {name} exceeded 1800s — dumping all "
            "thread stacks and aborting the run ===\n"
        )
        faulthandler.dump_traceback(file=sys.stderr)
        sys.stderr.flush()
        os._exit(42)

    t = threading.Timer(1800.0, _abort)
    t.daemon = True
    t.start()
    yield
    t.cancel()


# Replay/diagnosis profile: HYPOTHESIS_PROFILE=noshrink replays cached
# failures and generates fresh ones WITHOUT the shrink phase — a
# Spark-backed property can take 30+ minutes to shrink (hundreds of
# candidate examples, several Spark jobs each), which is exactly the
# r11-r13 "soak hang" signature. Decorator @settings keep their own
# max_examples/deadline; phases come from the profile.
from hypothesis import Phase as _HPhase
from hypothesis import settings as _hsettings

_hsettings.register_profile(
    "noshrink",
    phases=(_HPhase.explicit, _HPhase.reuse, _HPhase.generate, _HPhase.target),
)
if os.environ.get("HYPOTHESIS_PROFILE"):
    _hsettings.load_profile(os.environ["HYPOTHESIS_PROFILE"])
