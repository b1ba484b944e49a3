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
    note. r13 evidence: the first firing (at the then-20-min bound)
    caught a run whose main thread was actively PROGRESSING through
    rewrite.py while two CPU-heavy fuzz probes ran concurrently on the
    same 32 cores — contention-starved slowness, not a deadlock; the
    identical re-run alone passed in 20:00 total. The bound is sized
    to tolerate ~4-6x contention on a legitimate test while still
    converting a genuine runaway into a named, stack-carrying abort."""
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
