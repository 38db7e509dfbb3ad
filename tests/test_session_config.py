"""Session-level execution knobs that took a round to diagnose stay
pinned here so a refactor cannot silently drop them."""

from __future__ import annotations


def test_code_cache_sized_for_the_full_registry(spark):
    """Round-12 root cause of three rounds of 'unexplained' 2-5x bench
    spikes on late-running keys: the JDK-17 default 240 MB JIT code
    cache fills once one JVM has compiled the whole registry's
    whole-stage-codegen classes, the sweeper evicts hot methods, and
    interpreted-HOF call sites deopt. The 512 MB setting must survive
    on both the driver and executor lines."""
    for scope in ("spark.driver.extraJavaOptions",
                  "spark.executor.extraJavaOptions"):
        opts = spark.conf.get(scope, "")
        assert "ReservedCodeCacheSize=512m" in opts, scope


def test_code_cache_flag_reached_the_live_jvm(spark):
    """The conf string can read back as set while the JVM still runs
    the 240 MB default: getOrCreate() against an already-running
    session silently drops extraJavaOptions (round-12 ADVICE item 3 —
    exactly the inheritance failure suspected behind the driver rep's
    late-key spikes). Assert the LIVE JVM's input arguments, which
    cannot lie about what the process was launched with."""
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    args = [str(a) for a in mf.getRuntimeMXBean().getInputArguments()]
    cache_args = [a for a in args if "ReservedCodeCacheSize" in a]
    assert cache_args, (
        "no -XX:ReservedCodeCacheSize flag on the live JVM — the "
        "session builder's extraJavaOptions never reached the process "
        f"(input args: {args})")
    # the LAST occurrence wins in HotSpot if the flag repeats
    import os
    want = os.environ.get("SPARK_GRAFT_CODE_CACHE", "512m")
    assert cache_args[-1].endswith(f"ReservedCodeCacheSize={want}"), (
        f"live JVM runs {cache_args[-1]}, session.py asks for {want}")


def test_engine_knobs_present(spark):
    """The knobs every surface (tests, bench, driver contract) relies
    on: AQE on, Arrow on, UTC session timezone (the DuckDB oracle runs
    UTC — a local-zone session would shift every timestamp hash)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get(
        "spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
