"""Pallas TPU kernels for the hot codec stages.

The dense-XLA formulations (tpucomp.ops / tpucomp.codecs) are the portable
reference path; these kernels replace their gather/scatter hot spots with
VMEM-resident vector code.  Each kernel has an interpret-mode test and an
`enabled()` gate so the library falls back to XLA when Pallas/Mosaic is
unavailable.
"""
