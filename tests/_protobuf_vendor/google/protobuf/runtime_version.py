"""Permissive stand-in for protobuf's runtime_version gate: the bridged
runtime is 6.32.0 and pyspark's gencode is 6.33.0 — a minor-version skew
with no wire-format or gencode-API impact for the plain proto3 messages
pyspark uses.  Major-version mismatches still raise."""

from enum import Enum

MAJOR, MINOR, PATCH, SUFFIX = 6, 32, 0, "-bridge"


class Domain(Enum):
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(
    gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
):
    if gen_major != MAJOR:
        raise VersionError(
            f"gencode major version {gen_major} incompatible with bridged "
            f"runtime {MAJOR}.{MINOR}.{PATCH} when loading {location}"
        )
