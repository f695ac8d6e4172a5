"""Harness that imports the ACTUAL reference code for head-to-head tests.

The reference (/root/reference/putting_dune) is import-blocked here only by
a handful of pip deps that are not installed (shapely, msgpack_numpy,
frozendict, skimage) and by its protobuf module being generated in CI.
`loader.load_reference()` installs minimal API-faithful shims for those
modules (shims.py), compiles the reference's .proto with the in-box protoc
(resolving its tensorflow.TensorProto import against the REAL installed
TensorFlow at runtime), and imports the reference package — so parity
tests compare against the reference's own executed code, not against
re-implemented oracles.
"""
