"""The expected-skip registry: every environment-gated skip, named.

A green run of this suite on the development sandbox reports EXACTLY the
skips below (``pytest -rs``); anything outside this list is a regression
hiding behind a skip.  Same principle as the native-build gate's explicit
escape hatch (``MATRIX_EYES_ALLOW_NO_NATIVE`` in
tests/test_native_required.py): skips must be auditable by design, never
incidental.

Greppable tags (``expected-skip[...]``) so ``pytest -rs | grep
expected-skip`` surfaces only sanctioned skips:

* ``no-full-checkpoint`` x2 (tests/test_parity_real.py): the two
  regen-gated trained-checkpoint parity tests; they validate freshly
  regenerated artifacts under /tmp and therefore need the 1.9 GB
  full-size checkpoint plus a ``scripts/parity_real.py stages-f32`` run.
  The committed-artifact copies of the same contract always run
  (tests/test_parity_artifacts.py).
* ``root`` x1 (tests/test_loader_cache.py): the read-only-checkpoint-dir
  fallback cannot be exercised as root (chmod 500 does not bind).

Conditional infrastructure gates that are EXPECTED TO PASS here (native
encoder/writer builds, tests/test_native_required.py) are not in this
list; on this sandbox they run.
"""

SKIP_NO_FULL_CHECKPOINT = (
    "expected-skip[no-full-checkpoint]: full-size checkpoint / parity "
    "artifacts not present (run scripts/parity_real.py stages-f32)")

SKIP_ROOT_CANNOT_DROP_WRITE = (
    "expected-skip[root]: cannot make a directory read-only for this user")

SKIP_NO_XLA_COST_ANALYSIS = (
    "expected-skip[no-xla-cost-analysis]: XLA cost analysis unavailable "
    "on this backend")

# the documented set: (tag, count on this sandbox). Reasons with count 0
# are sanctioned environment guards that do NOT fire here (listed so the
# CI skip-audit gate accepts them if a backend change ever trips one).
EXPECTED = {
    SKIP_NO_FULL_CHECKPOINT: 2,
    SKIP_ROOT_CANNOT_DROP_WRITE: 1,
    SKIP_NO_XLA_COST_ANALYSIS: 0,
}
