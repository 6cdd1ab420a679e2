"""High-level interface ("HLIF" equivalent): self-describing artifacts.

Mirrors the reference's manager factory surface (hipcomp::create_manager,
reference src/highlevel/ManagerFactory.cpp) plus the per-format managers.
"""

from tpucomp.highlevel.manager import (
    CascadedManager,
    CompressionConfig,
    DecompressionConfig,
    LZ4Manager,
    Manager,
    SnappyManager,
    create_manager,
)

__all__ = [
    "CascadedManager",
    "CompressionConfig",
    "DecompressionConfig",
    "LZ4Manager",
    "Manager",
    "SnappyManager",
    "create_manager",
]
