from . import coloring, krylov, sparse, spmv
