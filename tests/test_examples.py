"""Doc-example smoke test (analog of the reference's test_examples.R:
exercise every exported function once on the bundled dataset)."""

import numpy as np
import pytest


def test_every_public_function(hapmap, tmp_path):
    import snprelate_tpu as sr

    sid = hapmap.sample_id
    snps = hapmap.snp_id

    r_ibs = sr.ibs(hapmap, sample_id=sid[:30])
    sr.ibs_num(hapmap, sample_id=sid[:20])
    p = sr.pca(hapmap, sample_id=sid[:40], eigen_cnt=4)
    sr.pca(hapmap, sample_id=sid[:40], algorithm="randomized", eigen_cnt=4,
           iter_num=3, seed=0)
    load = sr.pca_snp_loading(p, hapmap)
    sr.pca_samp_loading(load, hapmap, sample_id=sid[:50])
    sr.pca_corr(p, hapmap, eig_which=[1])
    em = sr.eigmix(hapmap, sample_id=sid[:30], eigen_cnt=2, ibdmat=True,
                   diagadj=False)
    eml = sr.pca_snp_loading(em, hapmap)
    sr.pca_samp_loading(eml, hapmap, sample_id=sid[:35])
    for m in ("GCTA", "Eigenstrat", "Corr", "EIGMIX", "IndivBeta"):
        sr.grm(hapmap, sample_id=sid[:25], method=m)
    sr.ibd_king(hapmap, sample_id=sid[:25], type="KING-robust",
                family_id=hapmap.sample_annot["pop.group"][:25])
    sr.ibd_king(hapmap, sample_id=sid[:25], type="KING-homo")
    sr.king_ibd_selection(hapmap, kinship_cutoff=0.25, sample_id=sid[:25],
                          missing_rate=np.nan, remove_monosnp=False)
    mom = sr.ibd_mom(hapmap, sample_id=sid[:25], kinship=True)
    sr.ibd_selection(mom, kinship_cutoff=0.1)
    mle = sr.ibd_mle(hapmap, sample_id=sid[:8], snp_id=snps[:500])
    sr.ibd_mle_loglik(hapmap, mle, relatedness="unrelated")
    g = sr.get_geno(hapmap, sample_id=sid[:4], snp_id=snps[:200],
                    snpfirstdim=True)
    af = np.nanmean(g, 1) / 2
    sr.pair_ibd(g[:, 0], g[:, 1], af, method="MoM")
    sr.pair_ibd_mle_loglik(g[:, 0], g[:, 1], af, k0=1, k1=0)
    sr.indiv_beta(hapmap, sample_id=sid[:20])
    b = sr.indiv_beta(hapmap, sample_id=sid[:20])
    sr.indiv_beta_rel(b, 0.1)
    sr.diss(hapmap, sample_id=sid[:20])
    sr.fst(hapmap, population=hapmap.sample_annot["pop.group"][:60],
           sample_id=sid[:60], method="W&H02")
    sr.hwe(hapmap, sample_id=sid[:30])
    sr.ind_inb(hapmap, sample_id=sid[:10], method="gcta1")
    sr.ind_inb_coef(g[:, 0], af, method="mom.visscher")
    sr.snp_rate_freq(hapmap, with_id=True)
    sr.samp_miss_rate(hapmap)
    sr.select_snp(hapmap, maf=0.1)
    sr.summary(hapmap)
    sr.ld_pair(g[:, 0], g[:, 1] if g.shape[1] > 1 else g[:, 0])
    sr.ld_mat(hapmap, snp_id=snps[:60], slide=10, method="dprime")
    sr.ld_pruning(hapmap, sample_id=sid[:30], snp_id=snps[:500],
                  start_pos="first",
                  autosave=str(tmp_path / "prune.pkl"))
    sr.apart_selection(hapmap.snp_chromosome[:500], hapmap.snp_position[:500],
                       seed=0)
    hc = sr.hcluster(r_ibs)
    ct = sr.cut_tree(hc, n_perm=60, seed=0)
    sr.draw_tree(ct, hc)
    pops = hapmap.sample_annot["pop.group"][:40]
    groups = {pp: sid[:40][pops == pp].tolist() for pp in set(pops.tolist())}
    if len(groups) >= 2:
        prop = sr.admix_prop(p, groups)
        sr.admix_plot(prop, group=pops)
        sr.admix_table(prop, pops)
    sr.pair_score(hapmap, sid[:3], sid[3:6], type="per.pair")
    sr.pair_score(hapmap, sid[:3], sid[3:6], type="gds.file",
                  output=str(tmp_path / "scores.gds"))
    sr.sliding_window(hapmap, "snpgdsSNPRateFreq", winsize=2000000,
                      shift=1000000, sample_id=sid[:20], snp_id=snps[:500])
    sl = sr.snp_list(hapmap)
    sr.snp_list_intersect(sl, sl)
    d1 = sr.create_geno_set(hapmap, sample_id=sid[:5], snp_id=snps[:100])
    sr.combine_geno([d1, sr.create_geno_set(hapmap, sample_id=sid[5:10],
                                            snp_id=snps[:100])])
    sr.allele_switch(d1, [str(a).split("/")[0] for a in d1.snp_allele])
    sr.allele_strand(d1.snp_allele, d1.snp_allele, af[:100], af[:100])
    gm = sr.grm(hapmap, sample_id=sid[:10], method="GCTA",
                out_fn=str(tmp_path / "g1.gds"))
    sr.merge_grm([str(tmp_path / "g1.gds")])
    sr.save_grm(gm, str(tmp_path / "g2.gds"))
    sr.load_grm(str(tmp_path / "g2.gds"))
    sr.snpgds_option(hapmap)
    sr.write_snp_gds(d1, str(tmp_path / "d1.gds"))
    sr.open_snp_gds(str(tmp_path / "d1.gds"))
    sr.snpdata_to_bed(d1, str(tmp_path / "d1"))
    sr.bed_to_snpdata(str(tmp_path / "d1.bed"), str(tmp_path / "d1.fam"),
                      str(tmp_path / "d1.bim"))
    sr.snpdata_to_ped(d1, str(tmp_path / "d1p"))
    sr.ped_to_snpdata(str(tmp_path / "d1p.ped"), str(tmp_path / "d1p.map"))
    sr.snpdata_to_eigen(d1, str(tmp_path / "d1e"))
    sr.transpose(d1)
    sr.snpgdsClose(d1)
    sr.snpgdsErrMsg()
