from .partition import Partition, rcb_partition
