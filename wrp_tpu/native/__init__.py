# Native (C++) runtime components; built on demand via wrp_tpu.native.build.
