"""snprelate_tpu — a TPU-native relatedness & PCA engine with the
capabilities of SNPRelate (Bioconductor), built on JAX/XLA/Pallas.

Public API mirrors the reference's exported snpgds* functions with snake_case
names; `snpgds*` aliases are provided for discoverability.
"""

def _setup_compile_cache():
    """Persistent XLA compilation cache: first-compile of the large jitted
    engines costs 2-10 s each on TPU; caching them on disk amortizes that
    across sessions (the accelerator-era analog of the reference shipping
    precompiled .so kernels). Opt out with SNPRELATE_TPU_COMPILE_CACHE=0
    (also: off/false/no); any other value is used as the cache dir."""
    import os

    path = os.environ.get("SNPRELATE_TPU_COMPILE_CACHE")
    if path is not None and path.strip().lower() in ("0", "", "off",
                                                     "false", "no"):
        return
    if not path:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "snprelate_tpu", "xla")
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:  # cache is best-effort; never block import
        pass


_setup_compile_cache()

from .io.store import (SNPData, create_geno, open_snp_gds,
                       example_filename, open_packed_store,
                       save_packed_store)
from .io.seqarray import open_seq_gds, write_seq_gds
from .io.gds import open_gds, write_snp_gds
from .io.convert import (bed_to_snpdata, snpdata_to_bed, vcf_to_snpdata,
                         vcf_to_store_sharded, ped_to_snpdata,
                         snpdata_to_ped, gen_to_snpdata,
                         gen_prob_to_snpdata, snpdata_to_eigen)
from .workspace import Workspace, init_workspace, snp_stats
from .utils.packed import PackedSymmetric
from .models.ibs import ibs, ibs_num
from .models.pca import pca
from .models.grm import grm, merge_grm, save_grm, load_grm
from .models.king import ibd_king, king_cross, king_ibd_selection
from .models.ibd_mom import ibd_mom
from .models.beta import indiv_beta, indiv_beta_rel
from .models.eigmix import eigmix
from .models.diss import diss
from .models.pca_ext import pca_corr, pca_snp_loading, pca_samp_loading
from .models.ld import ld_pair, ld_mat, ld_pruning, apart_selection
from .models.fst import fst
from .models.hwe import hwe
from .models.inbreeding import ind_inb, ind_inb_coef
from .models.stats import (snp_rate_freq, samp_miss_rate, select_snp,
                           get_geno, summary)
from .models.ibd_mle import (ibd_mle, ibd_mle_loglik, pair_ibd,
                             pair_ibd_mle_loglik, ibd_selection)
from .models.cluster import (hcluster, cut_tree, draw_tree, admix_prop,
                             admix_plot, admix_table)
from .models.misc import (pair_score, sliding_window, allele_switch,
                          allele_strand, snp_list, snp_list_intersect,
                          create_geno_set, combine_geno, snpgds_option,
                          transpose)


def close_snpdata(data):
    """snpgdsClose analog: SNPData is an in-memory container; nothing to
    close. Kept for drop-in compatibility."""


def err_msg():
    """snpgdsErrMsg analog: errors are raised as Python exceptions."""
    return ""


# Reference-style aliases
snpgdsOpen = open_snp_gds
snpgdsCreateGeno = create_geno
snpgdsExampleFileName = example_filename
snpgdsIBS = ibs
snpgdsIBSNum = ibs_num
snpgdsPCA = pca
snpgdsGRM = grm
snpgdsIBDKING = ibd_king
snpgdsIBDMoM = ibd_mom
snpgdsIndivBeta = indiv_beta
snpgdsIndivBetaRel = indiv_beta_rel
snpgdsEIGMIX = eigmix
snpgdsDiss = diss
snpgdsPCACorr = pca_corr
snpgdsPCASNPLoading = pca_snp_loading
snpgdsPCASampLoading = pca_samp_loading
snpgdsLDpair = ld_pair
snpgdsLDMat = ld_mat
snpgdsLDpruning = ld_pruning
snpgdsApartSelection = apart_selection
snpgdsFst = fst
snpgdsHWE = hwe
snpgdsIndInb = ind_inb
snpgdsIndInbCoef = ind_inb_coef
snpgdsSNPRateFreq = snp_rate_freq
snpgdsSampMissRate = samp_miss_rate
snpgdsSelectSNP = select_snp
snpgdsGetGeno = get_geno
snpgdsSummary = summary
snpgdsIBDMLE = ibd_mle
snpgdsIBDMLELogLik = ibd_mle_loglik
snpgdsPairIBD = pair_ibd
snpgdsPairIBDMLELogLik = pair_ibd_mle_loglik
snpgdsIBDSelection = ibd_selection
snpgdsBED2GDS = bed_to_snpdata
snpgdsGDS2BED = snpdata_to_bed
snpgdsVCF2GDS = vcf_to_snpdata
snpgdsPED2GDS = ped_to_snpdata
snpgdsGDS2PED = snpdata_to_ped
snpgdsGEN2GDS = gen_to_snpdata
# snpgdsSNPListClass is the reference's S3 class for snp_list results;
# here a plain dict with the same keys plays that role (man/
# snpgdsSNPListClass.Rd) — the alias keeps the 59/59 export map total
snpgdsSNPListClass = dict
snpgdsGDS2Eigen = snpdata_to_eigen
snpgdsHCluster = hcluster
snpgdsCutTree = cut_tree
snpgdsDrawTree = draw_tree
snpgdsAdmixProp = admix_prop
snpgdsPairScore = pair_score
snpgdsSlidingWindow = sliding_window
snpgdsAlleleSwitch = allele_switch
snpgdsSNPList = snp_list
snpgdsSNPListIntersect = snp_list_intersect
snpgdsCreateGenoSet = create_geno_set
snpgdsCombineGeno = combine_geno
snpgdsOption = snpgds_option
snpgdsMergeGRM = merge_grm
snpgdsAdmixPlot = admix_plot
snpgdsAdmixTable = admix_table
snpgdsTranspose = transpose
snpgdsClose = close_snpdata
snpgdsErrMsg = err_msg
snpgdsVCF2GDS_R = vcf_to_snpdata  # legacy pure-R path: same parser here

__version__ = "0.1.0"
