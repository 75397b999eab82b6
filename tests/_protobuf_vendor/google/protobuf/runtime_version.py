"""Stand-in for protobuf's runtime_version gate: the bridged runtime is
6.32.0 and pyspark's gencode is 6.33.0 — a minor-version skew with no
wire-format or gencode-API impact for the plain proto3 messages pyspark
uses.  Unlike the first cut (which accepted ANY same-major minor), the
accepted skew is PINNED to the validated range: gencode 6.32-6.33 on
the 6.32 runtime.  Anything outside that range raises so a container
refresh that bumps either side fails loudly instead of silently running
an unvalidated combination (see tests/test_protobuf_bridge.py)."""

from enum import Enum

MAJOR, MINOR, PATCH, SUFFIX = 6, 32, 0, "-bridge"

# gencode minors validated against the bridged 6.32.0 runtime
_ALLOWED_GENCODE_MINORS = (32, 33)


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(
    gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
):
    if gen_major != MAJOR or gen_minor not in _ALLOWED_GENCODE_MINORS:
        raise VersionError(
            f"gencode {gen_major}.{gen_minor}.{gen_patch} is outside the "
            f"validated range 6.{{{','.join(map(str, _ALLOWED_GENCODE_MINORS))}}} "
            f"for the bridged runtime {MAJOR}.{MINOR}.{PATCH} when loading "
            f"{location}; re-validate the skew or use the direct-drive "
            f"harness (tests/_protobuf_vendor/README.md)"
        )
