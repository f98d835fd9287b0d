"""raywin — Ray-Data-native point-in-time feature-engineering engine.

From-scratch reimplementation of the capabilities of airbnb/chronon
(reference at /root/reference, cited per-file) on ray.data.Dataset
pipelines.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large allocations on the brk heap and never trim it.

    This environment's page faults on fresh mmap regions cost ~0.5-1 ms/page,
    so glibc's default behavior (mmap every allocation >128 KiB, munmap on
    free) makes every big numpy temporary pay seconds of fault time.  Raising
    M_MMAP_THRESHOLD and disabling trim means the arena pages fault once per
    process and are reused forever after.  Runs in every process that imports
    raywin — including Ray workers deserializing our UDFs.
    """
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 0x7FFFFFFF)  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


_tune_malloc()
