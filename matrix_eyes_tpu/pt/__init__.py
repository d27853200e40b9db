"""Checkpoint subsystem: torch-free ``depth_pro.pt`` reading + conversion.

Mirrors the reference's loader stack (mod.rs:120-249): PytorchStore ->
KeyRemapper -> dtype adapter -> per-part application with hard errors on
missing keys, plus the ``--convert-checkpoints`` cache. Here the pipeline is
``pickle_reader`` (zip+pickle parse, no torch dependency) -> ``convert``
(torch layouts -> TPU-native layouts, spec-validated) -> ``cache`` (npz
per-part cache files named ``depth_pro-{part}.npz`` like the reference's
``depth_pro-{part}.mpk``, mod.rs:211-227).
"""
