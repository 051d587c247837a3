from . import host, instances, fq2
