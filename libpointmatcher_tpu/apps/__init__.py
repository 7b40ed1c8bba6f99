"""Command-line applications (reference: examples/ + evaluations/).

Run as ``python -m libpointmatcher_tpu.apps.<name>``:

- ``icp_simple``       — minimal registration of two clouds (examples/icp_simple.cpp)
- ``icp``              — full CLI with YAML config and initial transform (examples/icp.cpp)
- ``icp_advance_api``  — introspection demo: match ratio, residuals (examples/icp_advance_api.cpp)
- ``icp_customized``   — chain built programmatically via registrars (examples/icp_customized.cpp)
- ``align_sequence``   — scan-to-map odometry over a cloud list (examples/align_sequence.cpp)
- ``build_map``        — batch map building with ground-truth poses (examples/build_map.cpp)
- ``compute_overlap``  — pairwise overlap-ratio matrix (examples/compute_overlap.cpp)
- ``filter_profiler``  — filter timing harness (examples/filterProfiler.cpp)
- ``list_modules``     — registry dump with parameter docs + bibliography (examples/list_modules.cpp)
- ``eval_solution``    — ETH 'Challenging datasets' protocol runner (evaluations/eval_solution.cpp)
- ``golden_check``     — full-cloud golden-config sweep vs the reference's .ref_trans
"""
