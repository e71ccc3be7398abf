
cd /tmp/golden
prepare_receptor4.py -r goldenid_receptor.pdb
obabel goldenid_ligand.sdf -Ogoldenid_ligand.pdbqt
qvina2 \
    --receptor goldenid_receptor.pdbqt \
    --ligand goldenid_ligand.pdbqt \
    --center_x 1.0000 \
    --center_y 0.0000 \
    --center_z 2.5000 \
    --size_x 9.0 --size_y 9.0 --size_z 9.0 \
    --exhaustiveness 16
obabel goldenid_ligand_out.pdbqt -Ogoldenid_ligand_out.sdf -h
