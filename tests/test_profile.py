"""Deployment knee profile: defaults reproduce the tuned single-host
arithmetic byte-for-byte; env overrides rewire every knee site."""

from __future__ import annotations

from near_real_time_data_warehouse_spark.profile import KneeProfile, knee_profile


def test_default_profile_reproduces_tuned_knees():
    p = KneeProfile()
    for scan_bytes in (0, 1, 10 << 20, 300 << 20, 3 << 40):
        assert p.partitions(scan_bytes) == max(
            32, min(4096, scan_bytes // (8 << 20))
        )
        assert p.partitions(scan_bytes, text=True) == max(
            32, min(4096, scan_bytes // (256 << 10))
        )


def test_env_overrides_apply(monkeypatch):
    import near_real_time_data_warehouse_spark.profile as prof

    monkeypatch.setattr(prof, "_ACTIVE", None)
    monkeypatch.setenv("SPARK_GRAFT_KNEE_BYTES_PER_TASK", str(1 << 20))
    monkeypatch.setenv("SPARK_GRAFT_KNEE_MIN_PARTITIONS", "200")
    monkeypatch.setenv("SPARK_GRAFT_KNEE_MAX_PARTITIONS", "100000")
    p = prof.knee_profile()
    assert p.partitions(50 << 20) == 200  # floor raised
    assert p.partitions(1 << 40) == 100000  # cap raised
    assert p.partitions(400 << 20) == 400  # 1 MB/task rate
    monkeypatch.setattr(prof, "_ACTIVE", None)


def test_active_profile_is_default_here():
    # this container sets no overrides; knee sites must see the tuned
    # single-host defaults (the plans-byte-for-byte guarantee)
    assert knee_profile() == KneeProfile()
