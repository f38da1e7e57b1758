"""Pure, row-local kernels (no Ray imports).

These implement the reference's per-document semantics exactly; the
Ray-facing batch wrappers live in ``markdown_lab_ray.stages``.
"""
