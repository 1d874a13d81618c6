import numpy as np
TAPS=512
n = np.arange(TAPS, dtype=np.float64)
t = n - (TAPS-1)/2.0
h = np.sinc(t/64.0)/64.0 * np.hanning(TAPS)
h = h/h.sum()
i = np.arange(TAPS)
sgn = (-1.0)**(i//64)
C = h*sgn
SYN = np.cos((16.0+np.arange(64)[:,None])*(2.0*np.arange(32)[None,:]+1.0)*np.pi/64.0)
ANA = np.cos((2.0*np.arange(32)[:,None]+1.0)*(np.arange(64)[None,:]-16.0)*np.pi/64.0)
DELAY=481

def build_B(x):
    ns=len(x)//32
    B=np.zeros((ns,TAPS))
    buf=np.zeros(TAPS)
    for s in range(ns):
        buf=np.roll(buf,32); buf[:32]=x[s*32:s*32+32][::-1]
        B[s]=buf
    return B

def analysis_from_B(B, C):
    Z=(B*C).reshape(B.shape[0],8,64).sum(axis=1)
    return Z@ANA.T

def u_rows(sb):
    ns=sb.shape[0]; v=np.zeros(1024); U=np.empty((ns,TAPS))
    for s in range(ns):
        v=np.roll(v,64); v[:64]=SYN@sb[s]
        u=np.empty(TAPS)
        for j in range(8):
            u[j*64:j*64+32]=v[j*128:j*128+32]
            u[j*64+32:j*64+64]=v[j*128+96:j*128+128]
        U[s]=u
    return U

def d_step(B, x, C):
    sb=analysis_from_B(B,C)
    U=u_rows(sb)
    ns=U.shape[0]
    D=np.zeros(TAPS); sse=sst=0.0
    for j in range(32):
        idx=j+32*np.arange(16)
        rows=np.arange(40,ns)
        A=U[np.ix_(rows,idx)]
        ti=rows*32+j-DELAY
        m=ti>=0
        A=A[m]; tgt=x[ti[m]]
        sol,*_=np.linalg.lstsq(A,tgt,rcond=None)
        D[idx]=sol
        r=tgt-A@sol; sse+=(r@r); sst+=(tgt@tgt)
    return D, 10*np.log10(sst/sse)

def c_step(B, x, D):
    # out = sum_p C[p] * chain_p where chain_p = u_rows(sb_p) @ D_masked per phase
    ns=B.shape[0]
    # sb for basis p: outer(B[:,p], ANA[:,p%64])
    # build columns in chunks
    cols=np.zeros((ns*32, TAPS))
    for p in range(TAPS):
        sbp = B[:,p,None]*ANA[:,p%64][None,:]
        U=u_rows(sbp)
        # out for all phases: out[s*32+j] = sum_i U[s, j+32i]*D[j+32i]
        O=np.empty(ns*32)
        for j in range(32):
            idx=j+32*np.arange(16)
            O[j::32]=U[:,idx]@D[idx]
        cols[:,p]=O
    rows=np.arange(40*32, ns*32)
    ti=rows-DELAY
    m=ti>=0
    A=cols[rows[m]]; tgt=x[ti[m]]
    sol,*_=np.linalg.lstsq(A,tgt,rcond=None)
    r=tgt-A@sol
    return sol, 10*np.log10((tgt@tgt)/(r@r))

rng=np.random.RandomState(7)
x=rng.randn(32*300)
B=build_B(x)
D,snr=d_step(B,x,C); print("D-step1 SNR",round(snr,1),flush=True)
C2,snr=c_step(B,x,D); print("C-step1 SNR",round(snr,1),flush=True)
D2,snr=d_step(B,x,C2); print("D-step2 SNR",round(snr,1),flush=True)
C3,snr=c_step(B,x,D2); print("C-step2 SNR",round(snr,1),flush=True)
D3,snr=d_step(B,x,C3); print("D-step3 SNR",round(snr,1),flush=True)
# validate on held-out signal
xv=np.random.RandomState(99).randn(32*200)
Bv=build_B(xv)
sb=analysis_from_B(Bv,C3); U=u_rows(sb)
y=np.empty(len(xv))
for j in range(32):
    idx=j+32*np.arange(16)
    y[j::32]=U[:,idx]@D3[idx]
nl=len(xv)-DELAY
a=xv[:nl]; b=y[DELAY:DELAY+nl]
a=a[40*32:]; b=b[40*32:]
err=a-b
print("held-out SNR", round(10*np.log10((a@a)/(err@err)),1))
np.save('/tmp/mp3_C.npy', C3); np.save('/tmp/mp3_D.npy', D3)
