"""Pure-function kernels (no Ray imports at module scope)."""

# Shared tolerance cap for all media codecs: a real noisy-but-decodable
# file emits a handful of warnings; anything past this is a hostile
# payload engineered to amplify the warning side-channel (e.g. one
# warning per few bytes at the fetch stage's 64MB size cap == ~20M
# strings) — the codec raises its typed error instead, which the decode
# stage catches into the decode_error column, so the batch survives.
MAX_TOLERATED_WARNINGS = 256
