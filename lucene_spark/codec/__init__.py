from lucene_spark.codec.vbyte import vbyte_decode, vbyte_encode, delta_encode, delta_decode  # noqa: F401
from lucene_spark.codec.blocks import BLOCK_SIZE, build_block_meta  # noqa: F401
