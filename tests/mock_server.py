"""Compatibility shim: the mock Delta Sharing server moved into the package
(ADVICE r2: harness modules must not import from tests/, which is absent
when the package is installed without the repo tree)."""

from datafusion_delta_sharing_spark.harness.mockserver import (  # noqa: F401
    TOKEN,
    MockSharingServer,
    MockTable,
)
