from .partition import Partition, rcb_partition
from .coupling import CouplingServer, CouplingClient
