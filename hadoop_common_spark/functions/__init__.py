from hadoop_common_spark.functions.exact import dsum, davg, dstddev_pop, dstddev_samp

__all__ = ["dsum", "davg", "dstddev_pop", "dstddev_samp"]
